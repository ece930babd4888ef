"""Packed (space-to-depth) forward == canonical forward, incl. BN state and
gradients — the exactness gate for the TPU fast path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uresnet_tpu.config import ModelConfig
from uresnet_tpu.models.uresnet import uresnet_apply, uresnet_init


def cfgs(depth=2, base=4):
    a = ModelConfig(depth=depth, base_filters=base, num_class=3,
                    compute_dtype="float32", pack=False)
    # pack_extra_h=True keeps the (bench-gated, default-off) H-pack path
    # under equivalence coverage
    b = ModelConfig(depth=depth, base_filters=base, num_class=3,
                    compute_dtype="float32", pack=True, pack_extra_h=True)
    return a, b


@pytest.mark.parametrize("train", [False, True])
def test_packed_equals_canonical(train):
    cfg_a, cfg_b = cfgs()
    params, state = uresnet_init(jax.random.PRNGKey(21), cfg_a)
    x = jax.random.uniform(jax.random.PRNGKey(22), (2, 16, 16, 1))
    la, sa = uresnet_apply(params, state, x, cfg=cfg_a, train=train)
    lb, sb = uresnet_apply(params, state, x, cfg=cfg_b, train=train)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-3,
                               atol=5e-5)
    for a, b in zip(jax.tree.leaves(sa), jax.tree.leaves(sb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_packed_grads_match():
    cfg_a, cfg_b = cfgs()
    params, state = uresnet_init(jax.random.PRNGKey(23), cfg_a)
    x = jax.random.uniform(jax.random.PRNGKey(24), (2, 16, 16, 1))
    tgt = jax.random.normal(jax.random.PRNGKey(25), (2, 16, 16, 3))

    def loss(p, cfg):
        l, _ = uresnet_apply(p, state, x, cfg=cfg, train=True)
        return jnp.mean((l - tgt) ** 2)

    ga = jax.grad(lambda p: loss(p, cfg_a))(params)
    gb = jax.grad(lambda p: loss(p, cfg_b))(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5)


def test_packed_deeper_partial_packing():
    """depth 3, base 16, threshold 64: levels 0/1 packed, level 2 + mid not."""
    cfg_a = ModelConfig(depth=3, base_filters=16, num_class=2,
                        compute_dtype="float32", pack=False)
    cfg_b = ModelConfig(depth=3, base_filters=16, num_class=2,
                        compute_dtype="float32", pack=True)
    params, state = uresnet_init(jax.random.PRNGKey(26), cfg_a)
    x = jax.random.uniform(jax.random.PRNGKey(27), (1, 32, 32, 1))
    la, _ = uresnet_apply(params, state, x, cfg=cfg_a, train=False)
    lb, _ = uresnet_apply(params, state, x, cfg=cfg_b, train=False)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4,
                               atol=1e-5)


def test_packed_3d_equals_canonical():
    cfg_a = ModelConfig(dims=3, depth=2, base_filters=2, num_class=3,
                        compute_dtype="float32", pack=False)
    cfg_b = ModelConfig(dims=3, depth=2, base_filters=2, num_class=3,
                        compute_dtype="float32", pack=True)
    params, state = uresnet_init(jax.random.PRNGKey(31), cfg_a)
    x = jax.random.uniform(jax.random.PRNGKey(32), (1, 8, 8, 8, 1))
    for train in (False, True):
        la, sa = uresnet_apply(params, state, x, cfg=cfg_a, train=train)
        lb, sb = uresnet_apply(params, state, x, cfg=cfg_b, train=train)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-3,
                                   atol=5e-5)
        for a, b in zip(jax.tree.leaves(sa), jax.tree.leaves(sb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


def test_packed_remat():
    cfg_b = ModelConfig(depth=2, base_filters=4, num_class=3,
                        compute_dtype="float32", pack=True, remat=True)
    params, state = uresnet_init(jax.random.PRNGKey(28), cfg_b)
    x = jax.random.uniform(jax.random.PRNGKey(29), (1, 16, 16, 1))

    def loss(p):
        l, _ = uresnet_apply(p, state, x, cfg=cfg_b, train=True)
        return jnp.mean(l ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree.leaves(g))


# -- packed-loss fast path (round 2): the train loss/metrics consume the
# head's PACKED logits; per-pixel math is layout-invariant, so loss and
# grads must equal the canonical-logits path up to f32 reduction order.


@pytest.mark.parametrize("extra_h", [False, True])
def test_packed_logits_loss_equals_canonical(extra_h):
    from uresnet_tpu.engine.losses import weighted_softmax_xent
    from uresnet_tpu.models.packed import (loss_layout_phases,
                                           pack_like_logits)

    cfg = ModelConfig(depth=2, base_filters=4, num_class=3,
                      compute_dtype="float32", pack=True,
                      pack_extra_h=extra_h)
    ph = loss_layout_phases(cfg)
    assert ph == (8 if extra_h else 4)
    params, state = uresnet_init(jax.random.PRNGKey(40), cfg)
    key = jax.random.PRNGKey(41)
    x = jax.random.uniform(key, (2, 16, 16, 1))
    labels = jax.random.randint(jax.random.PRNGKey(42), (2, 16, 16), 0, 3)
    weights = jax.random.uniform(jax.random.PRNGKey(43), (2, 16, 16)) + 0.5

    def loss_canonical(p):
        lg, _ = uresnet_apply(p, state, x, cfg=cfg, train=True)
        return weighted_softmax_xent(lg, labels, weights)

    def loss_packed(p):
        lg, _ = uresnet_apply(p, state, x, cfg=cfg, train=True,
                              packed_logits=True)
        lg = lg.reshape(lg.shape[:-1] + (ph, cfg.num_class))
        lab = pack_like_logits(labels[..., None], cfg)
        w = pack_like_logits(weights[..., None], cfg)
        return weighted_softmax_xent(lg, lab, w)

    la, ga = jax.value_and_grad(loss_canonical)(params)
    lb, gb = jax.value_and_grad(loss_packed)(params)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_trainer_packed_loss_step_equals_canonical(tmp_path):
    """Full Trainer train_step with train.packed_loss on/off: loss and
    summary metrics agree (layout-invariant per-pixel reductions)."""
    import dataclasses

    from uresnet_tpu.config import Config, DataConfig, OptimConfig, TrainConfig
    from uresnet_tpu.engine.trainer import Trainer
    from uresnet_tpu.parallel.mesh import make_mesh

    mk = dict(depth=2, base_filters=4, num_class=3,
              compute_dtype="float32", pack=True, pack_extra_h=True)
    rng = np.random.default_rng(0)
    B, S = 2, 32
    batch = {
        "data": (rng.random((B, S, S, 1)) > 0.9).astype(np.float32),
        "label": rng.integers(0, 3, (B, S, S)).astype(np.int32),
        "weight": np.ones((B, S, S), np.float32),
    }
    out = {}
    for packed in (False, True):
        cfg = Config(
            model=ModelConfig(**mk),
            data=DataConfig(image_size=S, batch_size=B, planes=(0,)),
            optim=OptimConfig(lr=1e-3),
            train=TrainConfig(seed=3, packed_loss=packed),
        )
        tr = Trainer(cfg, mesh=make_mesh(1))
        ts = tr.init_state()
        ts2, m = tr.train_step(ts, tr._device_batch(batch))
        out[packed] = (jax.device_get(m), jax.device_get(ts2.params))
    ma, pa = out[False]
    mb, pb = out[True]
    for k in ma:
        np.testing.assert_allclose(ma[k], mb[k], rtol=1e-5, atol=1e-6,
                                   err_msg=f"metric {k}")
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("dims", [2, 3])
def test_head_dtype_f32_equality_and_unquantized(dims):
    """model.head_dtype='float32' (the packed-bf16 3D divergence fix,
    benchmarks/RESULTS.md round 4): packed == canonical still holds with
    the head dtype raised, and under bf16 compute the logits really leave
    the bf16 grid (the whole point — unquantized (softmax - onehot)
    residuals at heavily-weighted near-saturated pixels)."""
    import dataclasses

    cfg_c = ModelConfig(dims=dims, depth=2, base_filters=4, num_class=3,
                        compute_dtype="float32", head_dtype="float32",
                        pack=False)
    cfg_p = dataclasses.replace(cfg_c, pack=True)
    params, state = uresnet_init(jax.random.PRNGKey(31), cfg_c)
    x = jax.random.uniform(jax.random.PRNGKey(32), (2,) + (16,) * dims + (1,))
    lc, sc = uresnet_apply(params, state, x, cfg=cfg_c, train=True)
    lp, sp = uresnet_apply(params, state, x, cfg=cfg_p, train=True)
    np.testing.assert_allclose(np.asarray(lc), np.asarray(lp), rtol=1e-3,
                               atol=5e-5)
    for a, b in zip(jax.tree.leaves(sc), jax.tree.leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)

    for pack in (False, True):
        cfg = ModelConfig(dims=dims, depth=2, base_filters=4, num_class=3,
                          compute_dtype="bfloat16", head_dtype="float32",
                          pack=pack)
        y, _ = uresnet_apply(params, state, x, cfg=cfg, train=True)
        on_grid = np.mean(np.asarray(y) ==
                          np.asarray(y.astype(jnp.bfloat16), np.float32))
        assert on_grid < 0.9, (pack, on_grid)
        cfg_b = dataclasses.replace(cfg, head_dtype="")
        yb, _ = uresnet_apply(params, state, x, cfg=cfg_b, train=True)
        assert np.mean(np.asarray(yb) ==
                       np.asarray(yb.astype(jnp.bfloat16),
                                  np.float32)) == 1.0, pack
