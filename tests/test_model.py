import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uresnet_tpu.config import ModelConfig
from uresnet_tpu.models.blocks import BlockCtx, resblock_apply, resblock_init
from uresnet_tpu.models.uresnet import param_count, uresnet_apply, uresnet_init

TINY = ModelConfig(depth=2, base_filters=4, num_class=3, compute_dtype="float32")


def test_resblock_shapes_and_projection():
    ctx = BlockCtx(compute_dtype=jnp.float32)
    p, s = resblock_init(jax.random.PRNGKey(0), 4, 4, dims=2,
                         param_dtype=jnp.float32)
    assert "proj" not in p
    p2, s2 = resblock_init(jax.random.PRNGKey(0), 4, 8, dims=2,
                           param_dtype=jnp.float32)
    assert "proj" in p2
    x = jnp.ones((1, 8, 8, 4))
    y, _ = resblock_apply(ctx, p, s, x, train=True)
    assert y.shape == (1, 8, 8, 4)
    y2, _ = resblock_apply(ctx, p2, s2, x, train=True)
    assert y2.shape == (1, 8, 8, 8)
    assert np.all(np.asarray(y) >= 0)  # final ReLU


def test_uresnet_2d_shapes():
    params, state = uresnet_init(jax.random.PRNGKey(0), TINY)
    x = jnp.ones((2, 32, 32, 1))
    logits, ns = uresnet_apply(params, state, x, cfg=TINY, train=True)
    assert logits.shape == (2, 32, 32, 3)
    assert logits.dtype == jnp.float32
    # BN state must have been updated in train mode
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), state, ns)
    assert max(jax.tree.leaves(diff)) > 0


def test_uresnet_eval_state_unchanged():
    params, state = uresnet_init(jax.random.PRNGKey(0), TINY)
    x = jnp.ones((1, 32, 32, 1))
    _, ns = uresnet_apply(params, state, x, cfg=TINY, train=False)
    same = jax.tree.map(lambda a, b: bool(jnp.all(a == b)), state, ns)
    assert all(jax.tree.leaves(same))


def test_uresnet_3d_shapes():
    cfg = ModelConfig(dims=3, depth=2, base_filters=2, num_class=3,
                      compute_dtype="float32")
    params, state = uresnet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((1, 8, 8, 8, 1))
    logits, _ = uresnet_apply(params, state, x, cfg=cfg, train=False)
    assert logits.shape == (1, 8, 8, 8, 3)


def test_remat_matches_no_remat():
    cfg_a = TINY
    cfg_b = ModelConfig(**{**TINY.__dict__, "remat": True})
    params, state = uresnet_init(jax.random.PRNGKey(3), cfg_a)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 1))

    def loss(p, cfg):
        l, _ = uresnet_apply(p, state, x, cfg=cfg, train=True)
        return jnp.mean(l ** 2)

    la, ga = jax.value_and_grad(lambda p: loss(p, cfg_a))(params)
    lb, gb = jax.value_and_grad(lambda p: loss(p, cfg_b))(params)
    assert np.allclose(la, lb, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_bf16_forward_backward():
    """bf16 compute path (the TPU hot path) must trace, run and
    differentiate — catches operand/cotangent dtype mismatches that f32-only
    tests miss."""
    cfg = ModelConfig(depth=2, base_filters=4, num_class=3,
                      compute_dtype="bfloat16")
    params, state = uresnet_init(jax.random.PRNGKey(5), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(6), (2, 16, 16, 1))

    def loss(p):
        logits, _ = uresnet_apply(p, state, x, cfg=cfg, train=True)
        assert logits.dtype == jnp.float32
        return jnp.mean(logits ** 2)

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(val))
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
        # grads must come back in the param dtype (f32 master weights)
        assert g.dtype == jnp.float32


def test_golden_logits_fixture():
    """Fixed-seed tiny net -> checked-in logits checksum (SURVEY.md §4
    golden-value gate). Guards numerics drift across refactors/kernels."""
    cfg = ModelConfig(depth=2, base_filters=4, num_class=3,
                      compute_dtype="float32")
    params, state = uresnet_init(jax.random.PRNGKey(7), cfg)
    x = jnp.linspace(0, 1, 16 * 16).reshape(1, 16, 16, 1).astype(jnp.float32)
    logits, _ = uresnet_apply(params, state, x, cfg=cfg, train=False)
    s = np.asarray(jnp.sum(logits)).item()
    a = np.asarray(jnp.sum(jnp.abs(logits))).item()
    golden = np.load("tests/fixtures/golden_tiny2d.npz")
    np.testing.assert_allclose(s, golden["sum"], rtol=1e-4)
    np.testing.assert_allclose(a, golden["abssum"], rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logits[0, ::5, ::5, :]), golden["probe"], rtol=1e-3,
        atol=1e-4)


@pytest.mark.parametrize("pack", [False, True])
def test_remat_modes_numerically_equal(pack):
    """remat False / 'level' / 'block' are pure scheduling choices: logits
    and gradients must agree (recompute is the same computation)."""
    import dataclasses

    cfg0 = dataclasses.replace(TINY, pack=pack)
    x = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 1)),
                    jnp.float32)
    outs, grads = [], []
    for remat in (False, "level", "block"):
        cfg = dataclasses.replace(cfg0, remat=remat)
        params, state = uresnet_init(jax.random.PRNGKey(3), cfg)

        def loss_fn(p):
            logits, _ = uresnet_apply(p, state, x, cfg=cfg, train=True)
            return jnp.sum(logits ** 2)

        val, g = jax.jit(jax.value_and_grad(loss_fn))(params)
        outs.append(float(val))
        grads.append(jax.device_get(g))
    assert np.allclose(outs[0], outs[1], rtol=1e-6)
    assert np.allclose(outs[0], outs[2], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[2])):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_remat_bad_mode_raises():
    import dataclasses

    cfg = dataclasses.replace(TINY, remat="bogus")
    params, state = uresnet_init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="remat"):
        uresnet_apply(params, state, jnp.ones((1, 16, 16, 1)), cfg=cfg,
                      train=False)
