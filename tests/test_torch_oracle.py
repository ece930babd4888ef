"""Independent numerics oracle: the same U-ResNet computed with torch.

SURVEY.md §7 hard part #6: the reference mount is empty, so the golden
fixtures elsewhere in this suite are self-consistent — they pin our own
outputs. These tests cross-check every compute primitive AND the full model
(forward and backward) against an INDEPENDENT implementation: torch CPU in
float64. A systematic error in our SAME-padding arithmetic, transpose-conv
overlap-add, TF1-BN statistics, residual topology, or loss/grad plumbing
cannot hide in fixtures we generated ourselves.

Semantics pinned here (derived, then verified empirically):
  * SAME conv, stride 1, odd k  == torch conv, symmetric pad k//2.
  * SAME conv, stride s: per-dim pad_total = max((ceil(S/s)-1)*s + k - S, 0),
    split (floor, ceil) — TF pads MORE on the high side (even S, k=3, s=2
    -> (0, 1)), which symmetric torch padding cannot express.
  * lax.conv_transpose SAME, stride s: zero-stuff the input by s, pad
    (k-1, k+s-2-(k-1)) per dim, then CORRELATE with the unflipped kernel.
    This is NOT torch's ConvTranspose2d(padding=1, output_padding=1)
    alignment — the oracle computes the dilate+pad+conv form explicitly.
  * BN: biased batch variance, eps 1e-3, stats in high precision, applied
    as one folded per-channel affine (ops/norm.py).

torch is a TEST-ONLY dependency; the framework itself never imports it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from uresnet_tpu.config import ModelConfig  # noqa: E402
from uresnet_tpu.engine.losses import weighted_softmax_xent  # noqa: E402
from uresnet_tpu.models.uresnet import uresnet_apply, uresnet_init  # noqa: E402
from uresnet_tpu.ops.conv import conv, conv_init, conv_transpose  # noqa: E402
from uresnet_tpu.ops.norm import batch_norm, bn_init  # noqa: E402

DT = torch.float64  # the oracle runs in f64: it is the truth, not a twin


def _t(a, requires_grad=False):
    t = torch.tensor(np.asarray(a), dtype=DT)
    if requires_grad:
        t.requires_grad_(True)
    return t


def _nchw(x):
    """(B, *S, C) numpy/jax -> (B, C, *S) torch."""
    t = _t(x)
    nd = t.dim()
    return t.permute(0, nd - 1, *range(1, nd - 1))


def _to_nhwc(t):
    nd = t.dim()
    return t.permute(0, *range(2, nd), 1).detach().numpy()


def _w_oi(w):
    """HWIO / DHWIO kernel -> torch (O, I, *spatial)."""
    nd = w.dim()
    return w.permute(nd - 1, nd - 2, *range(nd - 2))


def _convnd(dims):
    return F.conv2d if dims == 2 else F.conv3d


def _same_pad(x, k, stride):
    """TF/XLA SAME padding: per-dim (floor, ceil) split of the total pad."""
    dims = x.dim() - 2
    pads = []
    for d in range(dims):
        s_in = x.shape[2 + d]
        out = -(-s_in // stride)
        total = max((out - 1) * stride + k - s_in, 0)
        pads.append((total // 2, total - total // 2))
    flat = []
    for lo, hi in reversed(pads):  # F.pad starts from the LAST dim
        flat += [lo, hi]
    return F.pad(x, flat)


def t_conv(x, w, b=None, *, stride=1):
    """Oracle for ops/conv.py conv(): SAME-padded correlation."""
    dims = x.dim() - 2
    k = w.shape[-1]
    y = _convnd(dims)(_same_pad(x, k, stride), w, stride=stride)
    if b is not None:
        y = y + b.reshape((1, -1) + (1,) * dims)
    return y


def t_conv_transpose(x, w, b=None, *, stride=2):
    """Oracle for ops/conv.py conv_transpose(): lax.conv_transpose SAME ==
    zero-stuff by stride, pad (k-1, k+s-2-(k-1)), correlate unflipped."""
    dims = x.dim() - 2
    k = w.shape[-1]
    sizes = [(s_in - 1) * stride + 1 for s_in in x.shape[2:]]
    xd = torch.zeros(x.shape[0], x.shape[1], *sizes, dtype=x.dtype)
    idx = (slice(None), slice(None)) + (slice(None, None, stride),) * dims
    xd[idx] = x
    pa, pb = k - 1, k + stride - 2 - (k - 1)
    flat = []
    for _ in range(dims):
        flat += [pa, pb]
    y = _convnd(dims)(F.pad(xd, flat), w)
    if b is not None:
        y = y + b.reshape((1, -1) + (1,) * dims)
    return y


def t_bn(x, scale, bias, mean=None, var=None, *, train, eps=1e-3):
    """Oracle for ops/norm.py batch_norm(): biased batch variance, folded
    per-channel affine. Returns (y, batch_mean, batch_var)."""
    dims = x.dim() - 2
    axes = (0,) + tuple(range(2, 2 + dims))
    if train:
        mean = x.mean(axes)
        var = x.var(axes, unbiased=False)
    g = scale / torch.sqrt(var + eps)
    b = bias - mean * g
    shape = (1, -1) + (1,) * dims
    return x * g.reshape(shape) + b.reshape(shape), mean, var


# ---------------------------------------------------------------------------
# op-level oracles
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dims", [2, 3])
@pytest.mark.parametrize("kernel,stride", [(3, 1), (1, 1), (3, 2)])
def test_conv_matches_torch(dims, kernel, stride):
    rng = np.random.default_rng(7)
    S = 12 if dims == 2 else 6
    x = rng.standard_normal((2,) + (S,) * dims + (3,)).astype(np.float32)
    p = conv_init(jax.random.PRNGKey(0), kernel, 3, 5, dims=dims)
    p = {"w": p["w"], "b": jnp.asarray(rng.standard_normal(5, np.float32))}
    ours = np.asarray(conv(jnp.asarray(x), p, stride=stride, dims=dims,
                           compute_dtype=jnp.float32))
    oracle = _to_nhwc(t_conv(_nchw(x), _w_oi(_t(p["w"])), _t(p["b"]),
                             stride=stride))
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dims", [2, 3])
@pytest.mark.parametrize("odd", [False, True])
def test_conv_stride2_odd_size_matches_torch(dims, odd):
    """SAME stride-2 pad split differs between odd (symmetric) and even
    (high-side) inputs — pin both against the oracle's ceil/floor split."""
    rng = np.random.default_rng(8)
    S = (13 if odd else 12) if dims == 2 else (7 if odd else 6)
    x = rng.standard_normal((1,) + (S,) * dims + (2,)).astype(np.float32)
    p = conv_init(jax.random.PRNGKey(1), 3, 2, 4, dims=dims, use_bias=False)
    ours = np.asarray(conv(jnp.asarray(x), p, stride=2, dims=dims,
                           compute_dtype=jnp.float32))
    oracle = _to_nhwc(t_conv(_nchw(x), _w_oi(_t(p["w"])), stride=2))
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dims", [2, 3])
def test_conv_transpose_matches_torch(dims):
    rng = np.random.default_rng(9)
    S = 6 if dims == 2 else 4
    x = rng.standard_normal((2,) + (S,) * dims + (4,)).astype(np.float32)
    p = conv_init(jax.random.PRNGKey(2), 3, 4, 3, dims=dims)
    ours = np.asarray(conv_transpose(jnp.asarray(x), p, stride=2, dims=dims,
                                     compute_dtype=jnp.float32))
    oracle = _to_nhwc(t_conv_transpose(_nchw(x), _w_oi(_t(p["w"])),
                                       _t(p["b"]), stride=2))
    assert ours.shape == oracle.shape  # (B, *S*2, 3)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("train", [True, False])
def test_batch_norm_matches_torch(train):
    rng = np.random.default_rng(10)
    x = rng.standard_normal((4, 9, 9, 6)).astype(np.float32) * 3 + 1
    params, state = bn_init(6)
    params = {"scale": jnp.asarray(rng.standard_normal(6, np.float32)),
              "bias": jnp.asarray(rng.standard_normal(6, np.float32))}
    state = {"mean": jnp.asarray(rng.standard_normal(6, np.float32)),
             "var": jnp.asarray(rng.random(6, np.float32) + 0.5)}
    ours, new_state = batch_norm(jnp.asarray(x), params, state, train=train)
    oracle, bmean, bvar = t_bn(
        _nchw(x), _t(params["scale"]), _t(params["bias"]),
        mean=_t(state["mean"]), var=_t(state["var"]), train=train)
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(oracle),
                               rtol=1e-5, atol=1e-6)
    if train:
        # TF1 moving update: biased batch var, momentum 0.99. (torch's own
        # running_var update would use UNBIASED var — the oracle computes
        # the TF1 form explicitly from the biased batch statistics.)
        np.testing.assert_allclose(
            np.asarray(new_state["mean"]),
            np.asarray(state["mean"]) * 0.99 + bmean.numpy() * 0.01,
            rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(new_state["var"]),
            np.asarray(state["var"]) * 0.99 + bvar.numpy() * 0.01,
            rtol=1e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# full-model oracle (forward + backward)
# ---------------------------------------------------------------------------


def torch_uresnet(params, state, x_t, cfg: ModelConfig, *, train: bool):
    """The full canonical U-ResNet (models/uresnet.py uresnet_apply,
    pack=False) recomputed with torch ops from the same param pytree.
    ``params`` leaves are torch tensors (so autograd can differentiate);
    ``state`` supplies the BN running stats used when ``train=False``."""

    def cb(name, h, *, stride=1, transpose=False, relu=True):
        p, s = params[name], state[name]
        h = (t_conv_transpose(h, _w_oi(p["conv"]["w"]), stride=stride)
             if transpose else
             t_conv(h, _w_oi(p["conv"]["w"]), stride=stride))
        h, _, _ = t_bn(h, p["bn"]["scale"], p["bn"]["bias"],
                       mean=s["bn"]["mean"], var=s["bn"]["var"],
                       train=train, eps=cfg.bn_eps)
        return F.relu(h) if relu else h

    def resblock(name, h):
        p = params[name]
        y = cb(f"{name}/cb1", h)
        y = cb(f"{name}/cb2", y, relu=False)
        short = t_conv(h, _w_oi(p["proj"]["w"])) if "proj" in p else h
        return F.relu(y + short)

    # flatten two-level access: params["enc0_b0"]["cb1"] via helper names
    class _View(dict):
        def __getitem__(self, k):
            if "/" in k:
                a, b = k.split("/")
                return dict.__getitem__(self, a)[b]
            return dict.__getitem__(self, k)

    params = _View(params)
    state = _View(state)

    h = cb("stem", x_t)
    skips = []
    for lvl in range(cfg.depth):
        for b in range(cfg.blocks_per_level):
            h = resblock(f"enc{lvl}_b{b}", h)
        skips.append(h)
        h = cb(f"down{lvl}", h, stride=2)
    for b in range(cfg.blocks_per_level):
        h = resblock(f"mid_b{b}", h)
    for lvl in reversed(range(cfg.depth)):
        h = cb(f"up{lvl}", h, stride=2, transpose=True)
        h = torch.cat([h, skips[lvl]], dim=1)
        for b in range(cfg.blocks_per_level):
            h = resblock(f"dec{lvl}_b{b}", h)
    head = params["head"]
    return t_conv(h, _w_oi(head["w"]), head["b"])


def _tiny_cfg(dims):
    return ModelConfig(dims=dims, num_class=3, base_filters=4,
                       depth=2 if dims == 2 else 1, blocks_per_level=2,
                       compute_dtype="float32", pack=False)


@pytest.mark.parametrize("dims,train", [(2, True), (2, False), (3, True)])
def test_full_model_forward_matches_torch(dims, train):
    cfg = _tiny_cfg(dims)
    S = 16 if dims == 2 else 8
    params, state = uresnet_init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(11)
    x = (rng.random((2,) + (S,) * dims + (1,)) *
         (rng.random((2,) + (S,) * dims + (1,)) > 0.7)).astype(np.float32)

    ours, _ = uresnet_apply(params, state, jnp.asarray(x), cfg=cfg,
                            train=train)
    t_params = jax.tree.map(_t, params)
    t_state = jax.tree.map(_t, state)
    oracle = _to_nhwc(torch_uresnet(t_params, t_state, _nchw(x), cfg,
                                    train=train))
    # f32 model vs f64 oracle: tolerance covers f32 accumulation only
    np.testing.assert_allclose(np.asarray(ours), oracle,
                               rtol=2e-4, atol=2e-5)


def test_full_model_backward_matches_torch():
    """Weighted-CE loss gradients w.r.t. EVERY param leaf against torch
    autograd — one independent check over the entire backward pass
    (conv/transpose-conv/BN/residual/concat grads and the loss plumbing)."""
    cfg = _tiny_cfg(2)
    S = 16
    params, state = uresnet_init(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(12)
    x = (rng.random((2, S, S, 1)) * (rng.random((2, S, S, 1)) > 0.7)
         ).astype(np.float32)
    labels = rng.integers(0, 3, (2, S, S)).astype(np.int32)
    weights = (rng.random((2, S, S)) + 0.5).astype(np.float32)

    def loss_fn(p):
        logits, _ = uresnet_apply(p, state, jnp.asarray(x), cfg=cfg,
                                  train=True)
        return weighted_softmax_xent(logits, jnp.asarray(labels),
                                     jnp.asarray(weights))

    loss, grads = jax.value_and_grad(loss_fn)(params)

    t_params = jax.tree.map(lambda a: _t(a, requires_grad=True), params)
    logits_t = torch_uresnet(t_params, jax.tree.map(_t, state),
                             _nchw(x), cfg, train=True)
    logz = torch.logsumexp(logits_t, dim=1)
    lab = torch.tensor(labels, dtype=torch.int64)
    true_logit = logits_t.gather(1, lab.unsqueeze(1)).squeeze(1)
    loss_t = ((logz - true_logit) * _t(weights)).mean()
    loss_t.backward()

    np.testing.assert_allclose(float(loss), float(loss_t.detach()),
                               rtol=1e-5)
    g_ours = jax.tree_util.tree_leaves_with_path(grads)
    g_oracle = jax.tree.leaves(t_params)
    assert len(g_ours) == len(g_oracle)
    for (path, g), t in zip(g_ours, g_oracle):
        np.testing.assert_allclose(
            np.asarray(g), t.grad.numpy(), rtol=5e-4, atol=5e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
