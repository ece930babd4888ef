"""TP: column/row channel-sharded conv pair == unsharded pair with one
allreduce, and full-model TP (channel-sharded train state under GSPMD) ==
the unsharded trainer (SURVEY.md §2.3)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from uresnet_tpu.parallel.mesh import make_mesh
from uresnet_tpu.parallel.tp import conv_col, conv_row

HI = lax.Precision.HIGHEST
DN = ("NHWC", "HWIO", "NHWC")


def ref(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=DN, precision=HI)


def test_col_row_pair_matches_unsharded():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((3, 3, 4, 8)).astype(np.float32) * .2)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 8, 4)).astype(np.float32) * .2)

    want = ref(jax.nn.relu(ref(x, w1)), w2)

    mesh = make_mesh(n_data=1, n_spatial=1, n_model=4)
    h = conv_col(x, w1, mesh=mesh, precision=HI)
    h = jax.nn.relu(h)
    got = conv_row(h, w2, mesh=mesh, precision=HI)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_mesh_three_axes():
    mesh = make_mesh(2, 2, 2)
    assert mesh.devices.shape == (2, 2, 2)
    assert mesh.axis_names == ("data", "spatial", "model")


# ---------------------------------------------------------------------------
# full-model TP: parallel.model > 1 channel-shards the whole train state
# ---------------------------------------------------------------------------


def _tiny_cfg(**model_kw):
    from uresnet_tpu.config import (Config, DataConfig, ModelConfig,
                                    OptimConfig, TrainConfig)

    model_kw.setdefault("pack", False)
    # eps=1e-3 conditions the Adam update for the leaf-exact comparison:
    # at the default 1e-8, near-zero gradients give u ~= sign(g) and the
    # psum reduction-order noise flips signs, diverging params by ~2*lr.
    return Config(
        model=ModelConfig(dims=2, num_class=3, base_filters=4, depth=2,
                          compute_dtype="float32", **model_kw),
        data=DataConfig(image_size=32, batch_size=4, planes=(0,),
                        synthetic=True, augment=False),
        train=TrainConfig(seed=0),
        optim=OptimConfig(eps=1e-3))


def _host_batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    B, S = cfg.data.batch_size, cfg.data.image_size
    return {
        "data": rng.random((B, S, S, 1), np.float32),
        "label": rng.integers(0, 3, (B, S, S)).astype(np.int32),
        "weight": np.ones((B, S, S), np.float32),
    }


def test_full_model_tp_train_equals_single_device(tmp_path):
    from jax.sharding import PartitionSpec as P

    from uresnet_tpu.engine.trainer import Trainer

    cfg = _tiny_cfg()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, checkpoint_dir=str(tmp_path / "ckpt")))
    tr_tp = Trainer(cfg, mesh=make_mesh(n_data=2, n_spatial=1, n_model=2))
    tr_1 = Trainer(cfg, mesh=make_mesh(n_data=1))
    ts_tp, ts_1 = tr_tp.init_state(), tr_1.init_state()

    # storage is genuinely channel-sharded over 'model' (kernels on Cout,
    # BN vectors on C); the num_class head (Cout=3, not divisible) falls
    # back to replicated
    assert ts_tp.params["stem"]["conv"]["w"].sharding.spec == P(
        None, None, None, "model")
    assert ts_tp.params["stem"]["bn"]["scale"].sharding.spec == P("model")
    assert ts_tp.model_state["stem"]["bn"]["mean"].sharding.spec == P("model")
    assert ts_tp.opt.mu["stem"]["conv"]["w"].sharding.spec == P(
        None, None, None, "model")
    assert ts_tp.params["head"]["w"].sharding.spec == P()
    assert ts_tp.key.sharding.spec == P()

    # Gradient-level equality, following test_dp_equals_single_device:
    # GSPMD's psums re-associate the f32 BN-stat reductions, which shifts
    # grads by up to ~1.4e-3 (measured there on ONE device by mere
    # re-association); post-Adam params are NOT compared because g/sqrt(g^2)
    # amplifies that noise to O(lr) wherever a grad is ~0 — an optimizer
    # property, not a sharding bug. Real TP bugs (missing psum over the
    # channel-sharded Cin reduction, per-shard BN stats) are O(1)-relative.
    batch = _host_batch(cfg, seed=0)
    grads, losses = [], []
    for tr, ts in ((tr_tp, ts_tp), (tr_1, ts_1)):
        # in_shardings inferred from the committed args (TP: channel-sharded
        # params/stats from init_state); grads gathered replicated to compare
        grad_fn = jax.jit(
            lambda p, s, b, _tr=tr: jax.value_and_grad(
                _tr._loss_fn, has_aux=True)(p, s, b, True),
            out_shardings=tr._rep)
        (loss, _aux), g = grad_fn(ts.params, ts.model_state,
                                  tr._device_batch(batch))
        losses.append(float(loss))
        grads.append(jax.device_get(g))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-4)
    # atol: the DP test measured ~1.4e-3 grad shift from ONE BN-stat
    # re-association; TP additionally re-blocks every conv's Cin reduction
    # (measured here: up to ~2.6e-3). A missing psum would be O(1).
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=5e-3)

    # the full optimizer step runs under TP shardings and stays sharded
    for step in range(2):
        b = _host_batch(cfg, seed=step)
        ts_tp, m_tp = tr_tp.train_step(ts_tp, tr_tp._device_batch(b))
        ts_1, m_1 = tr_1.train_step(ts_1, tr_1._device_batch(b))
        np.testing.assert_allclose(float(m_tp["loss"]), float(m_1["loss"]),
                                   rtol=5e-4)
    assert ts_tp.params["stem"]["conv"]["w"].sharding.spec == P(
        None, None, None, "model")
    p_tp = jax.device_get(ts_tp.params)

    # eval + forward run under the TP shardings
    m_eval = jax.device_get(tr_tp.eval_step(ts_tp, tr_tp._device_batch(
        _host_batch(cfg, seed=9))))
    assert np.isfinite(float(m_eval["loss"]))

    # checkpoint roundtrip: gather sharded leaves, restore re-shards
    tr_tp.save(ts_tp, step=2)
    ts_r, step_r, _ = tr_tp.restore()
    assert step_r == 2
    assert ts_r.params["stem"]["conv"]["w"].sharding.spec == P(
        None, None, None, "model")
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 jax.device_get(ts_r.params), p_tp)

    # checkpoints are mesh-independent: the TP-written file restores
    # bit-exactly into a single-device trainer (save gathers to host
    # arrays; restore re-shards to whatever mesh is current)
    ts_x, step_x, _ = tr_1.restore(
        path=str(tmp_path / "ckpt" / "step_00000002.npz"))
    assert step_x == 2
    assert ts_x.params["stem"]["conv"]["w"].sharding.spec == P()
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 jax.device_get(ts_x.params), p_tp)


def test_parallel_model_knob_builds_tp_mesh():
    from uresnet_tpu.engine.trainer import Trainer

    cfg = _tiny_cfg()
    cfg = cfg.replace(parallel=dataclasses.replace(cfg.parallel, model=2),
                      data=dataclasses.replace(cfg.data, batch_size=8))
    tr = Trainer(cfg)  # mesh from config: data = remaining devices
    assert tr._n_model == 2
    assert dict(zip(tr.mesh.axis_names, tr.mesh.devices.shape))["model"] == 2


def test_tp_requires_canonical_layout():
    from uresnet_tpu.engine.trainer import Trainer

    cfg = _tiny_cfg(pack=True)
    with pytest.raises(ValueError, match="canonical layout"):
        Trainer(cfg, mesh=make_mesh(n_data=1, n_spatial=1, n_model=2))


def test_full_model_tp_3d_loss_matches():
    """3D (NDHWC) under full-model TP: same channel-sharding rule, same
    loss as the single-device step (also recorded driver-visibly by the
    __graft_entry__.dryrun_multichip 3D DPxTP leg since round 5)."""
    from jax.sharding import PartitionSpec as P

    from uresnet_tpu.config import (Config, DataConfig, ModelConfig,
                                    OptimConfig, TrainConfig)
    from uresnet_tpu.engine.trainer import Trainer

    cfg = Config(
        model=ModelConfig(dims=3, num_class=3, base_filters=4, depth=2,
                          compute_dtype="float32", pack=False),
        data=DataConfig(image_size=16, batch_size=2, planes=(0,),
                        synthetic=True, augment=False),
        train=TrainConfig(seed=0), optim=OptimConfig(eps=1e-3))
    tr_tp = Trainer(cfg, mesh=make_mesh(n_data=2, n_spatial=1, n_model=2))
    tr_1 = Trainer(cfg, mesh=make_mesh(n_data=1))
    ts_tp, ts_1 = tr_tp.init_state(), tr_1.init_state()
    assert ts_tp.params["stem"]["conv"]["w"].sharding.spec == P(
        None, None, None, None, "model")

    rng = np.random.default_rng(7)
    S = cfg.data.image_size
    batch = {
        "data": rng.random((2, S, S, S, 1), np.float32),
        "label": rng.integers(0, 3, (2, S, S, S)).astype(np.int32),
        "weight": np.ones((2, S, S, S), np.float32),
    }
    ts_tp, m_tp = tr_tp.train_step(ts_tp, tr_tp._device_batch(batch))
    ts_1, m_1 = tr_1.train_step(ts_1, tr_1._device_batch(batch))
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_1["loss"]),
                               rtol=5e-4)
    assert ts_tp.params["stem"]["conv"]["w"].sharding.spec == P(
        None, None, None, None, "model")


def test_tp_evaluator_paths(tmp_path):
    """The ana/eval jit sites must accept the channel-sharded TrainState:
    evaluate_dataset (the exactly-once mIoU gate) and run_inference under a
    TP mesh match the single-device results. Regression for the in_shardings
    pin that crashed every evaluator surface under parallel.model > 1."""
    from uresnet_tpu.config import (Config, DataConfig, ModelConfig,
                                    TrainConfig)
    from uresnet_tpu.data.synthetic import generate_file
    from uresnet_tpu.engine.evaluator import evaluate_dataset, run_inference
    from uresnet_tpu.engine.trainer import Trainer

    path = generate_file(str(tmp_path / "tp_ana.usef"), 6, seed=5,
                         shape=(64, 64), planes=(0,))
    cfg = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32", pack=False),
        data=DataConfig(image_size=32, batch_size=4, planes=(0,),
                        input_files=(path,), synthetic=False,
                        random_access=False),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "ckpt"),
                          log_dir=str(tmp_path / "log")))
    tr_tp = Trainer(cfg, mesh=make_mesh(n_data=2, n_spatial=1, n_model=2))
    tr_1 = Trainer(cfg, mesh=make_mesh(1))
    ts_tp, ts_1 = tr_tp.init_state(), tr_1.init_state()

    m_tp = evaluate_dataset(tr_tp, ts_tp)   # exact mode (the gate)
    m_1 = evaluate_dataset(tr_1, ts_1)
    assert m_tp["n_events"] == m_1["n_events"] == 6
    np.testing.assert_allclose(m_tp["miou"], m_1["miou"], rtol=1e-4)
    np.testing.assert_allclose(m_tp["acc_nonzero"], m_1["acc_nonzero"],
                               rtol=1e-4)

    s_tp = run_inference(tr_tp, ts_tp, path, str(tmp_path / "tp.npz"))
    s_1 = run_inference(tr_1, ts_1, path, str(tmp_path / "one.npz"))
    np.testing.assert_allclose(s_tp["miou"], s_1["miou"], rtol=1e-4)


def test_spatial_x_model_mesh_is_rejected():
    """spatial x model meshes are rejected by the Trainer: XLA's SPMD
    partitioner miscompiles convs that are both spatially and
    output-feature partitioned (canary below)."""
    from uresnet_tpu.engine.trainer import Trainer

    cfg = _tiny_cfg()
    with pytest.raises(ValueError, match="cannot be combined"):
        Trainer(cfg, mesh=make_mesh(n_data=2, n_spatial=2, n_model=2))


def test_spatial_x_model_conv_miscompile():
    """CANARY for the XLA SPMD partitioner bug behind the Trainer's
    spatial x model guard: a SAME conv whose input is H-sharded over
    'spatial' and whose kernel is Cout-sharded over 'model' returns values
    wrong by O(1) at EVERY row (jax 0.9.0; not a halo artifact — each
    sharding alone is exact, see the assertions). If this test ever FAILS
    (the combined conv becomes exact), XLA is fixed: lift the guard in
    engine/trainer.py and re-enable the combined mesh."""
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(n_data=2, n_spatial=2, n_model=2)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 32, 32, 8)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 8, 8)) * 0.1).astype(np.float32)
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    def f(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn)

    ref = np.asarray(f(jnp.array(x), jnp.array(w)))
    sh = lambda s: NamedSharding(mesh, s)  # noqa: E731

    # each sharding alone is exact
    out_sp = np.asarray(jax.jit(f)(
        jax.device_put(jnp.array(x), sh(P("data", "spatial"))),
        jax.device_put(jnp.array(w), sh(P()))))
    np.testing.assert_allclose(out_sp, ref, atol=1e-5)
    out_tp = np.asarray(jax.jit(f)(
        jax.device_put(jnp.array(x), sh(P("data"))),
        jax.device_put(jnp.array(w), sh(P(None, None, None, "model")))))
    np.testing.assert_allclose(out_tp, ref, atol=1e-5)

    # combined: miscompiled (this assertion pins the BUG's presence)
    out_bad = np.asarray(jax.jit(f)(
        jax.device_put(jnp.array(x), sh(P("data", "spatial"))),
        jax.device_put(jnp.array(w), sh(P(None, None, None, "model")))))
    assert np.max(np.abs(out_bad - ref)) > 1.0, (
        "XLA now compiles the combined spatial x output-feature conv "
        "partitioning correctly — lift the spatial x model guard in "
        "engine/trainer.py and re-enable combined meshes")
