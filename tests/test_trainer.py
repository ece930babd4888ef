"""Engine tests: overfit slice, checkpoint/resume bit-exactness, DP equivalence
(SURVEY.md §4: integration + distributed-without-a-cluster contracts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uresnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig, TrainConfig
from uresnet_tpu.engine.optim import adam_init, adam_update
from uresnet_tpu.engine.trainer import Trainer, TrainState
from uresnet_tpu.parallel.mesh import make_mesh


def tiny_config(tmp_path, **model_kw) -> Config:
    return Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32", **model_kw),
        data=DataConfig(image_size=32, batch_size=4, planes=(0,),
                        synthetic=True, synthetic_events=16, seed=5,
                        num_threads=1, random_access=False),
        optim=OptimConfig(lr=3e-3),
        train=TrainConfig(iterations=8, summary_iter=4, checkpoint_iter=0,
                          val_iter=0, seed=11,
                          checkpoint_dir=str(tmp_path / "ckpt"),
                          log_dir=str(tmp_path / "log")),
    )


def fixed_batch(key, cfg):
    """Deterministic structured batch the net can overfit."""
    B, S = cfg.data.batch_size, cfg.data.image_size
    x = jax.random.uniform(key, (B, S, S, 1))
    label = (x[..., 0] > 0.66).astype(jnp.int32) * 2 \
        + ((x[..., 0] > 0.33) & (x[..., 0] <= 0.66)).astype(jnp.int32)
    data = x * (label > 0)[..., None]
    return {"data": data, "label": label,
            "weight": jnp.ones((B, S, S), jnp.float32)}


def test_cfg_swap_invalidates_compiled_cache(tmp_path):
    """Compiled executables bake cfg constants at first trace; replacing
    trainer.cfg must drop them so a same-shape call retraces with the new
    constants instead of silently reusing stale ones (round-3 review)."""
    import dataclasses

    cfg = tiny_config(tmp_path)
    trainer = Trainer(cfg, mesh=make_mesh(1))
    trainer._compiled["sentinel"] = object()
    trainer.cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, normalize_scale=2.0))
    assert trainer._compiled == {}
    assert trainer.cfg.data.normalize_scale == 2.0


def test_adam_decreases_quadratic():
    params = {"w": jnp.asarray([5.0, -3.0])}
    opt = adam_init(params)
    cfg = OptimConfig(lr=0.1)
    for _ in range(200):
        grads = jax.grad(lambda p: jnp.sum(p["w"] ** 2))(params)
        params, opt = adam_update(grads, opt, params, cfg)
    assert float(jnp.abs(params["w"]).max()) < 0.1
    assert int(opt.step) == 200


def test_rmsprop_decreases_quadratic():
    params = {"w": jnp.asarray([5.0, -3.0])}
    opt = adam_init(params)
    cfg = OptimConfig(optimizer="rmsprop", lr=0.05)
    for _ in range(300):
        grads = jax.grad(lambda p: jnp.sum(p["w"] ** 2))(params)
        params, opt = adam_update(grads, opt, params, cfg)
    assert float(jnp.abs(params["w"]).max()) < 0.1


def test_checkpoint_retention(tmp_path):
    from uresnet_tpu.engine.checkpoint import (latest_checkpoint,
                                               save_checkpoint)

    d = str(tmp_path / "ret")
    for step in range(1, 9):
        save_checkpoint(d, step, {"x": np.asarray([step])}, max_to_keep=3)
    import os
    kept = sorted(f for f in os.listdir(d) if f.endswith(".npz"))
    assert kept == ["step_00000006.npz", "step_00000007.npz",
                    "step_00000008.npz"]
    assert latest_checkpoint(d).endswith("step_00000008.npz")


def test_overfit_fixed_batch(tmp_path):
    cfg = tiny_config(tmp_path)
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts = tr.init_state()
    batch = fixed_batch(jax.random.PRNGKey(0), cfg)
    first = None
    for i in range(60):
        ts, m = tr.train_step(ts, batch)
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert last < first * 0.5, (first, last)
    assert float(m["acc_all"]) > 0.7


def test_checkpoint_resume_bit_exact(tmp_path):
    cfg = tiny_config(tmp_path)
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts = tr.init_state()
    batch = fixed_batch(jax.random.PRNGKey(1), cfg)
    for _ in range(3):
        ts, _ = tr.train_step(ts, batch)
    tr.save(ts, 3, data_cursor=7)

    # continue original
    ts_cont = ts
    for _ in range(2):
        ts_cont, _ = tr.train_step(ts_cont, batch)

    # restore and replay
    tr2 = Trainer(cfg, mesh=make_mesh(1))
    ts_r, step, cursor = tr2.restore()
    assert step == 3 and cursor == 7
    for _ in range(2):
        ts_r, _ = tr2.train_step(ts_r, batch)

    for a, b in zip(jax.tree.leaves(ts_cont.params), jax.tree.leaves(ts_r.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ts_cont.key), np.asarray(ts_r.key))


def test_fit_resume_across_epoch_boundary(tmp_path):
    """Train PAST an epoch boundary, resume from the checkpoint, and match
    the unbroken run bit-exactly (SURVEY.md §5: resume must be
    bitwise-deterministic given the saved PRNG and data cursor — including
    the per-epoch shuffle)."""
    def cfg_for(subdir):
        return Config(
            model=ModelConfig(depth=2, base_filters=4, num_class=3,
                              compute_dtype="float32"),
            # 8 events, 4 events/batch -> epoch boundary every 2 steps
            data=DataConfig(image_size=32, batch_size=4, planes=(0,),
                            synthetic=True, synthetic_events=8, seed=5,
                            num_threads=2, random_access=True),
            optim=OptimConfig(lr=3e-3),
            train=TrainConfig(summary_iter=100, checkpoint_iter=0,
                              val_iter=0, seed=11,
                              checkpoint_dir=str(tmp_path / subdir / "ckpt"),
                              log_dir=str(tmp_path / subdir / "log")),
        )

    tr_a = Trainer(cfg_for("unbroken"), mesh=make_mesh(1))
    ts_a, _ = tr_a.fit(iterations=6, log=False)

    cfg_b = cfg_for("resumed")
    Trainer(cfg_b, mesh=make_mesh(1)).fit(iterations=3, log=False)
    ts_b, _ = Trainer(cfg_b, mesh=make_mesh(1)).fit(
        iterations=3, resume=True, log=False)

    for a, b in zip(jax.tree.leaves(ts_a.params),
                    jax.tree.leaves(ts_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ts_a.key), np.asarray(ts_b.key))


def test_fit_end_to_end_synthetic(tmp_path):
    """MINIMUM END-TO-END SLICE (SURVEY.md §7 stage 4): real loader ->
    jitted steps -> checkpoint written -> metrics logged."""
    cfg = tiny_config(tmp_path)
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts, metrics = tr.fit(iterations=6, log=False)
    assert "loss" in metrics and np.isfinite(metrics["loss"])
    from uresnet_tpu.engine.checkpoint import latest_checkpoint
    assert latest_checkpoint(cfg.train.checkpoint_dir) is not None
    # restore loads cleanly
    ts2, step, _ = tr.restore()
    assert step == 6


def test_dp_equals_single_device(tmp_path):
    """pjit DP over 8 virtual devices == single device on the same global
    batch (SURVEY.md §4): loss, gradients and BN batch stats must agree up to
    f32 reduction order. (Params after Adam are NOT compared: where a grad is
    ~0, Adam's g/sqrt(g^2) amplifies reduction-order noise to O(lr) — an
    optimizer property, not a sharding bug.)"""
    cfg = tiny_config(tmp_path)
    cfg.data.batch_size = 8
    batch = fixed_batch(jax.random.PRNGKey(2), cfg)

    results = []
    for n_dev in (1, 8):
        tr = Trainer(cfg, mesh=make_mesh(n_dev))
        ts = tr.init_state()
        grad_fn = jax.jit(
            lambda p, s, b: jax.value_and_grad(tr._loss_fn, has_aux=True)(
                p, s, b, True),
            in_shardings=(tr._rep, tr._rep, tr._bsh),
            out_shardings=tr._rep)
        (loss, (_, mstate)), grads = grad_fn(ts.params, ts.model_state, batch)
        results.append((float(loss), jax.device_get(grads),
                        jax.device_get(mstate)))

    (l1, g1, s1), (l8, g8, s8) = results
    assert np.allclose(l1, l8, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        # Measured sensitivity: merely re-associating the BN batch-stat
        # reduction on ONE device shifts grads by up to ~1.4e-3 (f32
        # cancellation in mean2 - mean^2 and the BN backward); the sharded
        # reduction is one such re-association. Real sharding bugs (wrong
        # mean, missing allreduce) produce O(1)-relative errors.
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=2e-3)
    # BN stats: global-batch statistics under DP
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s8)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_fit_3d_end_to_end(tmp_path):
    """3D slice (BASELINE config 4 shape, tiny): loader -> packed 3D model ->
    checkpoint."""
    cfg = Config(
        model=ModelConfig(dims=3, depth=2, base_filters=2, num_class=3,
                          compute_dtype="float32", pack=True, remat=True),
        data=DataConfig(image_size=16, batch_size=2, planes=(0,),
                        synthetic=True, synthetic_events=4, seed=6,
                        num_threads=1, random_access=False),
        optim=OptimConfig(lr=1e-3),
        train=TrainConfig(iterations=2, summary_iter=1, checkpoint_iter=0,
                          val_iter=0, seed=12,
                          checkpoint_dir=str(tmp_path / "ckpt3d"),
                          log_dir=str(tmp_path / "log3d")),
    )
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts, metrics = tr.fit(iterations=2, log=False)
    assert np.isfinite(metrics["loss"])


def test_spatial_dp_equals_single_device(tmp_path):
    """(data=2, spatial=4) mesh: H sharded over 'spatial', batch over
    'data'; GSPMD inserts conv halo exchanges — loss/grads must equal the
    single-device run (SURVEY.md §2.3 CP analog)."""
    cfg = tiny_config(tmp_path)
    cfg.data.batch_size = 4
    batch = fixed_batch(jax.random.PRNGKey(7), cfg)

    results = []
    for mesh in (make_mesh(1), make_mesh(2, 4)):
        tr = Trainer(cfg, mesh=mesh)
        ts = tr.init_state()
        grad_fn = jax.jit(
            lambda p, s, b: jax.value_and_grad(tr._loss_fn, has_aux=True)(
                p, s, b, True),
            in_shardings=(tr._rep, tr._rep, tr._bsh),
            out_shardings=tr._rep)
        (loss, (_, mstate)), grads = grad_fn(ts.params, ts.model_state,
                                             batch)
        results.append((float(loss), jax.device_get(grads),
                        jax.device_get(mstate)))

    (l1, g1, s1), (l2, g2, s2) = results
    assert np.allclose(l1, l2, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=2e-3)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_eval_step_and_forward(tmp_path):
    cfg = tiny_config(tmp_path)
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts = tr.init_state()
    batch = fixed_batch(jax.random.PRNGKey(3), cfg)
    m = tr.eval_step(ts, batch)
    assert np.isfinite(float(m["loss"]))
    scores = tr.forward(ts, batch["data"])
    assert scores.shape == (4, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(scores.sum(-1)), 1.0, rtol=1e-4)


def test_steps_per_dispatch_bit_exact(tmp_path):
    """fit() with steps_per_dispatch=4 (lax.scan over stacked batches, one
    dispatch per 4 steps) must produce the SAME training trajectory as the
    per-step loop: identical batch stream, identical per-step math up to
    XLA fusion-order rounding inside scan (one-ulp f32 reduction drift,
    amplified by Adam where grads ~0 — same caveat as
    test_dp_equals_single_device)."""
    import dataclasses

    outs = {}
    for k in (1, 4):
        cfg = tiny_config(tmp_path / f"k{k}")
        cfg = dataclasses.replace(
            cfg,
            # augment=True: covers the per-scanned-step key chain AND the
            # in-scatter augmentation path (tiny_config is sparse-transfer)
            data=dataclasses.replace(cfg.data, augment=True),
            train=dataclasses.replace(
                cfg.train, iterations=8, summary_iter=4, checkpoint_iter=0,
                val_iter=0, steps_per_dispatch=k))
        tr = Trainer(cfg, mesh=make_mesh(1))
        ts, metrics = tr.fit(iterations=8, log=False)
        _, step, cursor = tr.restore()
        outs[k] = (jax.device_get(ts.params), metrics["loss"], step, cursor)
    p1, l1, s1, c1 = outs[1]
    p4, l4, s4, c4 = outs[4]
    # the data stream must be EXACTLY the same: same final step + cursor
    assert (s1, c1) == (s4, c4), ((s1, c1), (s4, c4))
    # loss after 8 identical steps: tight
    assert np.allclose(l1, l4, rtol=1e-5), (l1, l4)
    # params: XLA re-associates f32 reductions inside scan; Adam amplifies
    # the one-ulp drift where grads ~0 (same bound as the DP test above)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=2e-3)


def test_steps_per_dispatch_validation(tmp_path):
    import dataclasses

    cfg = tiny_config(tmp_path)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, iterations=8, summary_iter=3, checkpoint_iter=0,
            val_iter=0, steps_per_dispatch=4))
    tr = Trainer(cfg, mesh=make_mesh(1))
    with pytest.raises(ValueError, match="summary_iter"):
        tr.fit(iterations=8, log=False)


def test_fit_releases_loaders(tmp_path):
    """fit() must leave NO live loader worker threads and must close the
    val loader (round-2 review: val_loader leaked threads / a C++ handle
    per run)."""
    import threading

    import dataclasses

    cfg = tiny_config(tmp_path)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, val_iter=4, val_batches=1))
    before = set(threading.enumerate())
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts, _ = tr.fit(iterations=4, log=False)
    leaked = [t for t in threading.enumerate()
              if t not in before and t.is_alive()]
    assert not leaked, f"loader threads leaked: {leaked}"
    assert tr.loader is None and tr.val_loader is None


def test_train_step_file_weights_sparse(tmp_path):
    """weight_mode='file' end-to-end: USEF v2 weights ride the sparse wire
    and the in-jit densify; the resulting loss equals the dense-path loss
    on the same batch."""
    import dataclasses

    from uresnet_tpu.data.events import read_events, write_events
    from uresnet_tpu.data.loader import BatchLoader, resolve_input_files

    base = tiny_config(tmp_path)
    files = resolve_input_files(base.data, 2)
    events = read_events(files[0])[:8]
    rng = np.random.default_rng(3)
    for evt in events:
        for pl in evt.planes:
            pl.weights = rng.uniform(0.2, 3.0,
                                     len(pl.values)).astype(np.float32)
    wpath = str(tmp_path / "w.usef")
    write_events(wpath, events, ndims=2)

    def mk(transfer):
        d = dataclasses.replace(base.data, input_files=(wpath,),
                                synthetic=False, weight_mode="file",
                                transfer=transfer, max_points=2048)
        return dataclasses.replace(base, data=d)

    tr_s = Trainer(mk("sparse"), mesh=make_mesh(1))
    tr_d = Trainer(mk("dense"), mesh=make_mesh(1))
    bs = BatchLoader(mk("sparse").data, num_class=3)._make_batch()
    bd = BatchLoader(mk("dense").data, num_class=3)._make_batch()
    bs.pop("cursor"); bd.pop("cursor")
    ms = tr_s.eval_step(tr_s.init_state(), tr_s._device_batch(bs))
    md = tr_d.eval_step(tr_d.init_state(), tr_d._device_batch(bd))
    assert abs(float(ms["loss"]) - float(md["loss"])) < 1e-5
    # and the train step runs (grads flow through the weighted loss)
    ts = tr_s.init_state()
    ts2, m = tr_s.train_step(ts, tr_s._device_batch(
        dict(BatchLoader(mk("sparse").data, num_class=3)._make_batch())))
    assert np.isfinite(float(m["loss"]))


def test_fit_with_exact_validation(tmp_path):
    """cfg.train.val_exact: the in-loop validation runs the exactly-once
    full-dataset pass (dataset-global mIoU with n_events/n_pixels
    witnesses) instead of sampling batches."""
    import dataclasses

    cfg = tiny_config(tmp_path)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, val_iter=4,
                                       val_exact=True))
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts, _ = tr.fit(iterations=4, log=False)
    vm = tr.validate(ts)
    assert vm["n_events"] == 16              # the whole held-out set, once
    assert vm["n_pixels"] == 16 * 32 * 32
    assert np.isfinite(vm["miou"])


# -- fine-tuning: optim.freeze + train.load_params_only (SURVEY.md §2.1
# -- model assembly: the reference's `trainable` knob + restore-then-retrain)

def _leaf_paths(tree):
    from uresnet_tpu.engine.checkpoint import _path_str

    return {_path_str(p): np.asarray(l)
            for p, l in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_freeze_leaves_untouched(tmp_path):
    """Frozen leaves (params AND Adam moments) stay bit-identical through
    real train steps — even under weight_decay, which would drift them if
    freezing only zeroed the grads — while every unfrozen leaf moves."""
    import dataclasses

    cfg = tiny_config(tmp_path)
    cfg = dataclasses.replace(
        cfg, optim=OptimConfig(lr=3e-3, weight_decay=1e-2,
                               freeze=("head", r"bn/scale$")))
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts0 = tr.init_state()
    before = _leaf_paths(ts0.params)
    s0 = _leaf_paths(ts0.model_state)  # before donation deletes ts0
    batch = fixed_batch(jax.random.PRNGKey(2), cfg)
    ts = ts0
    for _ in range(3):
        ts, _ = tr.train_step(ts, batch)
    after = _leaf_paths(ts.params)
    mu = _leaf_paths(ts.opt.mu)
    frozen = [k for k in before
              if k.startswith("head") or k.endswith("bn/scale")]
    assert frozen, "pattern sanity"
    for k in before:
        if k in frozen:
            np.testing.assert_array_equal(before[k], after[k], err_msg=k)
            assert not mu[k].any(), f"moment updated for frozen leaf {k}"
        else:
            assert (before[k] != after[k]).any(), f"unfrozen leaf stuck: {k}"
    # BN running stats still update in train mode (TF1 update-ops semantics)
    s1 = _leaf_paths(ts.model_state)
    assert any((s0[k] != s1[k]).any() for k in s0)


def test_freeze_pattern_validation(tmp_path):
    import dataclasses

    cfg = tiny_config(tmp_path)
    bad = dataclasses.replace(cfg, optim=OptimConfig(freeze=("nonexistent",)))
    with pytest.raises(ValueError, match="match no param leaf"):
        Trainer(bad, mesh=make_mesh(1))._freeze
    total = dataclasses.replace(cfg, optim=OptimConfig(freeze=(".",)))
    with pytest.raises(ValueError, match="EVERY param leaf"):
        Trainer(total, mesh=make_mesh(1))._freeze


def test_freeze_excluded_from_clip_norm():
    """Frozen grads must not inflate grad_clip_norm's global norm (TF1
    var_list semantics): freezing leaf b == literally zeroing b's grad."""
    params = {"a": jnp.asarray([1.0, 2.0]), "b": jnp.asarray([4.0])}
    grads = {"a": jnp.asarray([3.0, 0.0]), "b": jnp.asarray([400.0])}
    cfg = OptimConfig(lr=0.1, grad_clip_norm=1.0)
    frozen, _ = adam_update(grads, adam_init(params), params, cfg,
                            freeze={"a": False, "b": True})
    zeroed, _ = adam_update({"a": grads["a"], "b": jnp.zeros(1)},
                            adam_init(params), params, cfg)
    np.testing.assert_array_equal(np.asarray(frozen["a"]),
                                  np.asarray(zeroed["a"]))
    np.testing.assert_array_equal(np.asarray(frozen["b"]),
                                  np.asarray(params["b"]))


def test_load_params_only(tmp_path):
    """train.load_params_only: pretrained params + BN stats, FRESH
    optimizer/PRNG at step 0 — and it applies ONLY to load_file, never to
    the run's own checkpoints."""
    import dataclasses

    cfg = tiny_config(tmp_path)
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts = tr.init_state()
    batch = fixed_batch(jax.random.PRNGKey(3), cfg)
    for _ in range(3):
        ts, _ = tr.train_step(ts, batch)
    path = tr.save(ts, 3, data_cursor=7)

    ft_dir = str(tmp_path / "ft_ckpt")
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, load_file=path,
                                       load_params_only=True,
                                       checkpoint_dir=ft_dir))
    tr2 = Trainer(cfg2, mesh=make_mesh(1))
    ts2, step, cursor = tr2.restore()
    assert step == 0 and cursor == 0
    for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ts.model_state),
                    jax.tree.leaves(ts2.model_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(ts2.opt.step) == 0
    assert not any(np.asarray(l).any() for l in jax.tree.leaves(ts2.opt.mu))
    np.testing.assert_array_equal(
        np.asarray(ts2.key),
        np.asarray(tr2._host_state(cfg2.train.seed).key))

    # the fine-tune run's OWN checkpoints restore fully
    tr2.save(ts, 5, data_cursor=9)
    ts3, step3, cursor3 = tr2.restore(
        __import__("uresnet_tpu.engine.checkpoint",
                   fromlist=["latest_checkpoint"]).latest_checkpoint(ft_dir))
    assert step3 == 5 and cursor3 == 9
    assert int(ts3.opt.step) == int(ts.opt.step)


def test_resume_prefers_own_checkpoint_over_load_file(tmp_path):
    """fit(--resume) must pick up the run's latest checkpoint, not reload
    train.load_file (a preempted fine-tune restart would otherwise silently
    lose progress)."""
    import dataclasses

    from uresnet_tpu.engine.checkpoint import latest_checkpoint

    cfg = tiny_config(tmp_path)
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts = tr.init_state()
    pre = tr.save(ts, 3)

    ft_dir = str(tmp_path / "ft2_ckpt")
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, load_file=pre,
                                       load_params_only=True,
                                       checkpoint_dir=ft_dir,
                                       checkpoint_iter=2))
    tr2 = Trainer(cfg2, mesh=make_mesh(1))
    tr2.fit(iterations=2, log=False)          # params-only start at 0, saves step 2
    assert latest_checkpoint(ft_dir)

    seen = {}
    real = tr2.restore
    own_latest = latest_checkpoint(ft_dir)          # step 2, the run's own

    def spy(path=None):
        seen["path"] = path
        return real(path)

    tr2.restore = spy
    tr2.fit(iterations=2, resume=True, log=False)   # 2 MORE steps from 2
    assert seen["path"] == own_latest
    # resumed at 2 and advanced to 4; a wrong load_file restart would have
    # begun at 0 again and left the latest checkpoint at step 2
    assert latest_checkpoint(ft_dir).endswith("step_00000004.npz")


def test_freeze_stop_gradient_matches_masked_update(tmp_path):
    """The backward-pruning path (stop_gradient on frozen leaves, which lets
    XLA DCE their weight-grad computations) must compute the same thing as
    the naive path (full value_and_grad, frozen grads zeroed): frozen grads
    come out EXACTLY zero, unfrozen grads and the loss agree to f32
    reduction-order noise. (Post-Adam params are NOT compared element-wise:
    g/(|g|+eps) amplifies noise on near-zero grads; the optimizer-side
    semantics are pinned separately in test_freeze_excluded_from_clip_norm
    and the end-to-end behavior in test_freeze_leaves_untouched.)"""
    import dataclasses

    from uresnet_tpu.engine.optim import freeze_mask

    cfg = tiny_config(tmp_path)
    cfg = dataclasses.replace(
        cfg, optim=OptimConfig(lr=3e-3, weight_decay=1e-2,
                               grad_clip_norm=1.0, freeze=("enc", "stem")))
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts = tr.init_state()
    batch = fixed_batch(jax.random.PRNGKey(7), cfg)
    frz = tr._freeze

    def pruned_loss(params, mstate, b, train):
        # exactly the wrapper _train_step installs when optim.freeze is set
        params = jax.tree.map(
            lambda f, p: jax.lax.stop_gradient(p) if f else p, frz, params)
        return tr._loss_fn(params, mstate, b, train)

    (l1, _), g_pruned = jax.value_and_grad(pruned_loss, has_aux=True)(
        ts.params, ts.model_state, batch, True)
    (l2, _), g_naive = jax.value_and_grad(tr._loss_fn, has_aux=True)(
        ts.params, ts.model_state, batch, True)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    gp = jax.tree_util.tree_leaves_with_path(g_pruned)
    gn = jax.tree.leaves(g_naive)
    fz = jax.tree.leaves(frz)
    assert any(fz) and not all(fz)
    for (path, a), b, f in zip(gp, gn, fz):
        a, b = np.asarray(a), np.asarray(b)
        if f:
            assert not a.any(), f"frozen grad not pruned to zero: {path}"
            assert b.any(), f"oracle grad unexpectedly zero: {path}"
        else:
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6,
                                       err_msg=str(path))

    # and the real train_step runs the pruned path end-to-end
    ts1, m1 = tr.train_step(ts, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(l2), rtol=1e-5)
