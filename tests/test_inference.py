"""Inference/ana path tests (SURVEY.md §3.2 contract) + decoder
fault-injection/restart (SURVEY.md §5 failure detection)."""

import numpy as np
import pytest

from uresnet_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from uresnet_tpu.data.synthetic import generate_file
from uresnet_tpu.engine.evaluator import evaluate_dataset, run_inference
from uresnet_tpu.engine.trainer import Trainer
from uresnet_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("inf")
    path = generate_file(str(tmp / "ana.usef"), 6, seed=21, shape=(128, 128),
                         planes=(0, 1))
    cfg = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=64, batch_size=4, planes=(0, 1),
                        input_files=(path,), synthetic=False,
                        random_access=False),
        train=TrainConfig(checkpoint_dir=str(tmp / "ckpt"),
                          log_dir=str(tmp / "log")),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state()
    return trainer, ts, path, tmp


def test_run_inference_score_export(setup):
    trainer, ts, path, tmp = setup
    out = str(tmp / "scores.npz")
    stats = run_inference(trainer, ts, path, out)
    assert stats["n_events"] == 6
    z = np.load(out)
    assert set(z.files) >= {"event_id", "plane_id", "coords", "scores",
                            "pred", "label"}
    n = len(z["event_id"])
    assert n > 0 and stats["n_pixels"] == n
    assert z["scores"].shape == (n, 3)
    # softmax scores: each row sums to 1
    np.testing.assert_allclose(z["scores"].sum(1), 1.0, rtol=1e-4)
    # every event/plane combination present
    assert set(np.unique(z["event_id"])) == set(range(6))
    assert set(np.unique(z["plane_id"])) == {0, 1}
    # pred is argmax of scores
    np.testing.assert_array_equal(z["pred"], z["scores"].argmax(1))


def test_run_inference_empty_file(setup, tmp_path):
    """A valid 0-event USEF file must produce an empty export and zeroed
    metrics, not a loader construction error (round-3 review finding —
    the streamed default cannot build a loader over an empty file)."""
    from uresnet_tpu.data import events as ev

    trainer, ts, _, _ = setup
    path = str(tmp_path / "empty.usef")
    ev.write_events(path, [], ndims=2)
    for fmt in ("npz", "usef"):
        out = str(tmp_path / f"empty_out.{fmt}")
        stats = run_inference(trainer, ts, path, out, fmt=fmt)
        assert stats["n_events"] == 0 and stats["n_pixels"] == 0
        assert stats["acc_all"] == 0.0 and stats["miou"] == 1.0
        if fmt == "npz":
            z = np.load(out)
            assert len(z["event_id"]) == 0 and z["scores"].shape == (0, 3)
        else:
            assert ev.num_events(out) == 0


def test_run_inference_rejects_out_of_range_labels(setup, tmp_path):
    """Labels >= model.num_class must fail LOUDLY (and identically) in both
    export modes instead of an opaque bincount/reshape error (dense) or a
    silent one_hot drop (sparse) — round-3 review finding."""
    from uresnet_tpu.data import events as ev

    trainer, ts, _, _ = setup
    bad = str(tmp_path / "bad.usef")
    planes = []
    for pid in (0, 1):
        planes.append(ev.SparsePlane(
            plane_id=pid, shape=(128, 128),
            coords=np.array([[5, 5], [6, 7]], np.int32),
            values=np.array([1.0, 2.0], np.float32),
            labels=np.array([1, 7], np.uint8)))  # 7 >= num_class=3
    ev.write_events(bad, [ev.SparseEvent(planes=planes)] * 2, ndims=2)
    for export in ("sparse", "dense"):
        with pytest.raises(ValueError, match="num_class"):
            run_inference(trainer, ts, bad,
                          str(tmp_path / f"bad_out_{export}.npz"),
                          export=export)


def test_run_inference_usef_writeback(setup):
    """Reference-style score-map writeback (SURVEY.md §3.2): per-class score
    planes in USEF format, round-trippable through data/events.py, scores in
    ORIGINAL detector coordinates."""
    from uresnet_tpu.data import events as ev
    from uresnet_tpu.engine.evaluator import score_plane_id

    trainer, ts, path, tmp = setup
    out = str(tmp / "scores.usef")
    stats = run_inference(trainer, ts, path, out, fmt="usef")
    assert stats["n_events"] == 6

    back = ev.read_events(out)
    assert len(back) == 6
    inputs = ev.read_events(path)
    num_class = trainer.cfg.model.num_class
    for evt_in, evt_out in zip(inputs, back):
        # one score plane per (input plane, class)
        assert len(evt_out.planes) == 2 * num_class
        by_id = {p.plane_id: p for p in evt_out.planes}
        for pin in evt_in.planes:
            if pin.plane_id not in (0, 1):
                continue
            cls_planes = [by_id[score_plane_id(pin.plane_id, c, num_class)]
                          for c in range(num_class)]
            # score planes share coords (original space, inside the source
            # plane's extent) and softmax across classes sums to 1
            n = len(cls_planes[0].values)
            assert n > 0
            for cp in cls_planes:
                np.testing.assert_array_equal(cp.coords, cls_planes[0].coords)
                assert tuple(cp.shape) == tuple(pin.shape)
                assert (cp.coords >= 0).all()
                assert (cp.coords < np.asarray(pin.shape)).all()
            total = sum(cp.values.astype(np.float64) for cp in cls_planes)
            np.testing.assert_allclose(total, 1.0, rtol=1e-3)
            # labels carry the predicted class = argmax over score planes
            stacked = np.stack([cp.values for cp in cls_planes], axis=1)
            np.testing.assert_array_equal(cls_planes[0].labels,
                                          stacked.argmax(1).astype(np.uint8))


def test_evaluate_dataset_metrics(setup):
    trainer, ts, path, tmp = setup
    m = evaluate_dataset(trainer, ts, num_batches=2)
    for k in ("loss", "acc_all", "acc_nonzero", "miou"):
        assert k in m and np.isfinite(m[k])


def test_loader_kill_and_restart(setup):
    """Fault injection: stop the threaded producer mid-epoch, restart from
    the recorded cursor -> identical continuation, no deadlock."""
    trainer, ts, path, tmp = setup
    loader = trainer.make_loader(train=False)
    if hasattr(loader, "close"):      # C++ path
        loader.start(2)
    else:
        loader.start(2)
    b1 = loader.next()
    cursor = int(b1["cursor"])
    loader.stop()                      # simulated crash/stop

    loader2 = trainer.make_loader(train=False, start_event=cursor)
    b2a = loader2.next()
    loader2.stop()

    loader3 = trainer.make_loader(train=False, start_event=cursor)
    b3a = loader3.next()
    loader3.stop()
    # restart is deterministic from the cursor (works for dense and sparse
    # transfer batches alike)
    for k in b2a:
        if isinstance(b2a[k], np.ndarray):
            np.testing.assert_array_equal(b2a[k], b3a[k], err_msg=k)
    for l in (loader, loader2, loader3):
        if hasattr(l, "close"):
            l.close()


def test_evaluate_dataset_exact_counts_each_event_once(setup):
    """num_batches=None (the gate mode): a 6-event file with 2 events/batch
    -> exactly 3 batches, every event once (the old fixed-16-batch sampler
    wrapped this file ~5x). Oracle: densify ALL events in one numpy pass
    and compute the dataset-global confusion directly."""
    from uresnet_tpu.data import events as ev
    from uresnet_tpu.data.pipeline import densify_batch
    from uresnet_tpu.engine.metrics import metrics_from_counts

    trainer, ts, path, tmp = setup
    m = evaluate_dataset(trainer, ts)           # exact mode
    assert m["n_events"] == 6

    events = ev.read_events(path)
    batch = densify_batch(events, image_size=64, planes=(0, 1),
                          weight_mode="ones", num_class=3)
    # forward with the SAME ts the evaluator used
    preds = []
    for i in range(0, 12, 4):                    # forward is jitted for B=4
        preds.append(np.asarray(
            trainer.forward(ts, batch["data"][i:i + 4])).argmax(-1))
    pred = np.concatenate(preds)
    C = 3
    conf = np.bincount((pred.astype(np.int64) * C
                        + batch["label"].astype(np.int64)).ravel(),
                       minlength=C * C).reshape(C, C).astype(np.float64)
    nz = batch["data"][..., 0] > 0
    want = metrics_from_counts({
        "conf": conf, "n_pixels": float(pred.size),
        "correct_nonzero": float((pred[nz] == batch["label"][nz]).sum()),
        "n_nonzero": float(nz.sum())})
    # model-free counts must match EXACTLY: any wrapped/double-counted
    # event would inflate them (6 events x 2 planes x 64^2 pixels)
    assert m["n_pixels"] == 6 * 2 * 64 * 64
    assert m["n_nonzero"] == float(nz.sum())
    # metric agreement at near-tie tolerance: the evaluator's fused
    # forward+counts program and trainer.forward are different XLA
    # programs; on an untrained net a few ~equal-logit pixels argmax-flip
    for k in ("acc_all", "acc_nonzero", "miou", "iou_class0", "iou_class1",
              "iou_class2"):
        assert abs(m[k] - want[k]) < 5e-3, (k, m[k], want[k])


def test_evaluate_dataset_exact_masks_wrapped_tail(tmp_path):
    """Event count NOT divisible by events-per-batch: the final batch's
    wrapped rows must be masked out (5 events, 2/batch -> 3 batches, one
    masked event). Witness: the model-free pixel counts."""
    from uresnet_tpu.data import events as ev
    from uresnet_tpu.data.pipeline import densify_batch

    path = generate_file(str(tmp_path / "odd.usef"), 5, seed=33,
                         shape=(128, 128), planes=(0, 1))
    cfg = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=64, batch_size=4, planes=(0, 1),
                        input_files=(path,), synthetic=False,
                        random_access=False),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "c"),
                          log_dir=str(tmp_path / "l")),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1))
    m = evaluate_dataset(trainer, trainer.init_state())
    batch = densify_batch(ev.read_events(path), image_size=64, planes=(0, 1),
                          weight_mode="ones", num_class=3)
    assert m["n_events"] == 5
    assert m["n_pixels"] == 5 * 2 * 64 * 64        # NOT 6 * 2 * 64 * 64
    assert m["n_nonzero"] == float((batch["data"][..., 0] > 0).sum())


def test_run_inference_reports_same_miou_as_exact_eval(setup):
    """Both gate surfaces — `infer --metrics-only` (evaluate_dataset exact)
    and the score-export pass (run_inference) — must report the SAME
    dataset mIoU (VERDICT r2 missing #2)."""
    trainer, ts, path, tmp = setup
    m_eval = evaluate_dataset(trainer, ts)
    m_inf = run_inference(trainer, ts, path, str(tmp / "gate.npz"))
    # both passes visit the same pixels exactly once (model-free check)
    assert m_eval["n_nonzero"] == m_inf["n_pixels"]
    # metric agreement at near-tie tolerance (different XLA programs
    # argmax-flip a few ~equal-logit pixels on an untrained net)
    for k in ("acc_all", "acc_nonzero", "miou", "iou_class0", "iou_class1",
              "iou_class2"):
        assert abs(m_eval[k] - m_inf[k]) < 5e-3, (k, m_eval[k], m_inf[k])


def test_streamed_inference_matches_host_path(setup):
    """The streamed ana path (threaded loader -> sparse transfer -> fused
    device densify + forward, round-3) must export BYTE-IDENTICAL results
    to the legacy synchronous host-densify path."""
    trainer, ts, path, tmp = setup
    m_host = run_inference(trainer, ts, path, str(tmp / "host.npz"),
                           streamed=False)
    m_str = run_inference(trainer, ts, path, str(tmp / "streamed.npz"),
                          streamed=True, export="dense")
    assert m_host["n_events"] == m_str["n_events"]
    assert m_host["n_pixels"] == m_str["n_pixels"]
    zh = np.load(str(tmp / "host.npz"))
    zs = np.load(str(tmp / "streamed.npz"))
    assert set(zh.files) == set(zs.files)
    for k in zh.files:
        np.testing.assert_array_equal(zh[k], zs[k], err_msg=k)
    for k in ("acc_all", "acc_nonzero", "miou"):
        assert m_host[k] == m_str[k], k


@pytest.mark.parametrize("k", [2, 16])
def test_readback_group_is_invisible(setup, k):
    """readback_group=K (device->host readbacks issued K batches at a time,
    the round-trip amortization for high-latency links) must be byte-
    invisible: identical npz export and metrics for any K — including
    K > n_batches (3 here), which exercises the tail drain."""
    trainer, ts, path, tmp = setup
    m1 = run_inference(trainer, ts, path, str(tmp / "rg1.npz"))
    mk = run_inference(trainer, ts, path, str(tmp / f"rg{k}.npz"),
                       readback_group=k)
    z1 = np.load(str(tmp / "rg1.npz"))
    zk = np.load(str(tmp / f"rg{k}.npz"))
    for key in z1.files:
        np.testing.assert_array_equal(z1[key], zk[key], err_msg=key)
    assert m1 == mk


def test_streamed_inference_usef_writeback(setup):
    trainer, ts, path, tmp = setup
    run_inference(trainer, ts, path, str(tmp / "h.usef"), fmt="usef",
                  streamed=False)
    run_inference(trainer, ts, path, str(tmp / "s.usef"), fmt="usef",
                  streamed=True)
    with open(str(tmp / "h.usef"), "rb") as f:
        hb = f.read()
    with open(str(tmp / "s.usef"), "rb") as f:
        sb = f.read()
    assert hb == sb  # byte-identical reference-style writeback


def test_sparse_export_matches_dense(setup):
    """export='sparse' (device point-gather + on-device confusion counts,
    ~60x less readback) must produce the same npz/usef exports as the dense
    host path."""
    trainer, ts, path, tmp = setup
    m_host = run_inference(trainer, ts, path, str(tmp / "eh.npz"),
                           streamed=False, export="dense")
    m_sp = run_inference(trainer, ts, path, str(tmp / "es.npz"),
                         streamed=True, export="sparse")
    assert m_host["n_events"] == m_sp["n_events"]
    assert m_host["n_pixels"] == m_sp["n_pixels"]
    zh = np.load(str(tmp / "eh.npz"))
    zs = np.load(str(tmp / "es.npz"))
    for k in zh.files:
        np.testing.assert_array_equal(zh[k], zs[k], err_msg=k)
    for k in ("acc_all", "acc_nonzero", "miou", "iou_class0", "iou_class1",
              "iou_class2"):
        assert abs(m_host[k] - m_sp[k]) < 5e-3, (k, m_host[k], m_sp[k])

    run_inference(trainer, ts, path, str(tmp / "eh.usef"), fmt="usef",
                  streamed=False, export="dense")
    run_inference(trainer, ts, path, str(tmp / "es.usef"), fmt="usef",
                  streamed=True, export="sparse")
    with open(str(tmp / "eh.usef"), "rb") as f:
        hb = f.read()
    with open(str(tmp / "es.usef"), "rb") as f:
        sb = f.read()
    assert hb == sb


def test_scores_at_points_matches_dense_indexing():
    """Device point-gather == indexing the dense score map at the scattered
    coords (the crop math is shared with densify_on_device)."""
    import jax

    from uresnet_tpu.data.device_pipeline import (densify_on_device,
                                                  scores_at_points)
    from uresnet_tpu.data.pipeline import sparse_batch
    from uresnet_tpu.data.synthetic import generate_event

    rng = np.random.default_rng(5)
    events = [generate_event(rng, shape=(128, 128), planes=(0,))
              for _ in range(3)]
    sp = sparse_batch(events, planes=(0,), max_points=2048)
    T = 64
    dense = densify_on_device(sp, image_size=T)
    fake_scores = jax.numpy.asarray(
        rng.standard_normal((3, T, T, 3)).astype(np.float32))
    got = np.asarray(scores_at_points(sp, fake_scores, image_size=T))
    from uresnet_tpu.data.pipeline import crop_or_pad_coords

    fs = np.asarray(fake_scores)
    for row, evt in enumerate(events):
        pl = evt.planes[0]
        shifted, inwin = crop_or_pad_coords(pl.coords, pl.shape, T,
                                            values=pl.values)
        npt = len(pl.values)
        want = fs[row][tuple(shifted[inwin].T)]
        np.testing.assert_array_equal(got[row, :npt][inwin], want)


def test_sparse_export_3d_matches_dense(tmp_path):
    """Sparse export in 3D: point-gather crop math and npz/usef ordering
    generalize to volumes (coords (N,3), byte-identical to the host path)."""
    path = generate_file(str(tmp_path / "v3.usef"), 4, seed=11,
                         shape=(64, 64, 64), planes=(0,))
    cfg = Config(
        model=ModelConfig(dims=3, depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=32, batch_size=2, planes=(0,),
                        input_files=(path,), synthetic=False,
                        random_access=False, max_points=4096),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "c"),
                          log_dir=str(tmp_path / "l")),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state()
    m_h = run_inference(trainer, ts, path, str(tmp_path / "h.npz"),
                        streamed=False, export="dense")
    m_s = run_inference(trainer, ts, path, str(tmp_path / "s.npz"),
                        streamed=True, export="sparse")
    assert m_h["n_pixels"] == m_s["n_pixels"]
    zh, zs = np.load(str(tmp_path / "h.npz")), np.load(str(tmp_path / "s.npz"))
    assert zh["coords"].shape[1] == 3
    for k in zh.files:
        np.testing.assert_array_equal(zh[k], zs[k], err_msg=k)


def test_evaluate_dataset_exact_multifile(tmp_path):
    """Exact mode spans MULTIPLE input files: n_events/batch count derive
    from the union, every event counted once."""
    from uresnet_tpu.data import events as ev
    from uresnet_tpu.data.pipeline import densify_batch

    p1 = generate_file(str(tmp_path / "a.usef"), 3, seed=1,
                       shape=(128, 128), planes=(0,))
    p2 = generate_file(str(tmp_path / "b.usef"), 4, seed=2,
                       shape=(128, 128), planes=(0,))
    cfg = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=32, batch_size=2, planes=(0,),
                        input_files=(p1, p2), synthetic=False,
                        random_access=False),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "c"),
                          log_dir=str(tmp_path / "l")),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1))
    m = evaluate_dataset(trainer, trainer.init_state())
    assert m["n_events"] == 7
    assert m["n_pixels"] == 7 * 32 * 32
    evs = ev.read_events(p1) + ev.read_events(p2)
    batch = densify_batch(evs, image_size=32, planes=(0,),
                          weight_mode="ones", num_class=3)
    assert m["n_nonzero"] == float((batch["data"][..., 0] > 0).sum())


def test_gate_surfaces_agree_exactly_on_trained_model(tmp_path):
    """On a TRAINED checkpoint (confident logits, no argmax near-ties) the
    two gate surfaces — evaluate_dataset exact mode and run_inference —
    must report IDENTICAL dataset metrics, not tolerance-close ones."""
    import dataclasses

    path = generate_file(str(tmp_path / "g.usef"), 6, seed=13,
                         shape=(128, 128), planes=(0,))
    cfg = Config(
        model=ModelConfig(depth=2, base_filters=8, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=32, batch_size=2, planes=(0,),
                        input_files=(path,), synthetic=False,
                        random_access=True),
        train=TrainConfig(iterations=30, summary_iter=30, checkpoint_iter=0,
                          val_iter=0, seed=3,
                          checkpoint_dir=str(tmp_path / "c"),
                          log_dir=str(tmp_path / "l")),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts, _ = trainer.fit(iterations=30, log=False)
    # evaluation is sequential regardless of the train-time shuffle
    trainer.cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, random_access=False))
    m_eval = evaluate_dataset(trainer, ts)
    m_inf = run_inference(trainer, ts, path, str(tmp_path / "g.npz"))
    assert m_eval["n_nonzero"] == m_inf["n_pixels"]
    for k in ("acc_all", "acc_nonzero", "miou", "iou_class0", "iou_class1",
              "iou_class2"):
        assert m_eval[k] == m_inf[k], (k, m_eval[k], m_inf[k])


def test_evaluate_dataset_exact_under_dp_mesh(tmp_path):
    """Exact evaluation under the 8-device DP mesh == single-device: the
    confusion counts reduce globally under pjit, the row mask rides the
    batch sharding."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from uresnet_tpu.config import ParallelConfig

    path = generate_file(str(tmp_path / "dp.usef"), 10, seed=17,
                         shape=(128, 128), planes=(0,))
    base = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=32, batch_size=8, planes=(0,),
                        input_files=(path,), synthetic=False,
                        random_access=False),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "c"),
                          log_dir=str(tmp_path / "l")),
    )
    tr1 = Trainer(base, mesh=make_mesh(1))
    ts = tr1.init_state()
    m1 = evaluate_dataset(tr1, ts)
    import dataclasses

    cfg8 = dataclasses.replace(base, parallel=ParallelConfig(data=8))
    tr8 = Trainer(cfg8)
    ts8 = tr8.init_state()
    m8 = evaluate_dataset(tr8, ts8)
    assert m1["n_events"] == m8["n_events"] == 10
    assert m1["n_pixels"] == m8["n_pixels"]
    assert m1["n_nonzero"] == m8["n_nonzero"]
    for k in ("acc_all", "acc_nonzero", "miou"):
        assert abs(m1[k] - m8[k]) < 5e-3, (k, m1[k], m8[k])


def test_evaluate_dataset_exact_dense_transfer(tmp_path):
    """Exact mode over data.transfer='dense' (host densify) must count the
    same pixels as the sparse-transfer path."""
    import dataclasses

    path = generate_file(str(tmp_path / "dt.usef"), 5, seed=19,
                         shape=(128, 128), planes=(0,))
    base = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=32, batch_size=2, planes=(0,),
                        input_files=(path,), synthetic=False,
                        random_access=False),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "c"),
                          log_dir=str(tmp_path / "l")),
    )
    ms = {}
    for transfer in ("sparse", "dense"):
        cfg = dataclasses.replace(
            base, data=dataclasses.replace(base.data, transfer=transfer))
        tr = Trainer(cfg, mesh=make_mesh(1))
        ms[transfer] = evaluate_dataset(tr, tr.init_state())
    assert ms["sparse"]["n_pixels"] == ms["dense"]["n_pixels"] == 5 * 32 * 32
    assert ms["sparse"]["n_nonzero"] == ms["dense"]["n_nonzero"]
    for k in ("acc_all", "acc_nonzero", "miou"):
        assert abs(ms["sparse"][k] - ms["dense"][k]) < 5e-3


def test_ana_never_truncates_busy_events(tmp_path):
    """An event with MORE points than data.max_points: ana auto-sizes its
    sparse pad from the file (events.max_plane_points), so streamed
    exports (both modes) still match the never-truncating host path
    (round-3 review finding: the wire truncation silently shifted the
    crop window and dropped pixels)."""
    from uresnet_tpu.data import events as ev

    rng = np.random.default_rng(3)
    planes = []
    for npts in (700, 80):   # first event is 'busy': 700 > max_points=256
        n = npts
        # unique coords packed into one 64^2 region so the crop window
        # keeps them ALL (the busy event then clearly exceeds max_points)
        cs = rng.choice(64 * 64, n, replace=False)
        coords = np.stack([32 + cs // 64, 32 + cs % 64], 1).astype(np.int32)
        planes.append(ev.SparsePlane(
            plane_id=0, shape=(128, 128), coords=coords,
            values=rng.uniform(1, 50, n).astype(np.float32),
            labels=rng.integers(0, 3, n).astype(np.uint8)))
    path = str(tmp_path / "busy.usef")
    ev.write_events(path, [ev.SparseEvent([p]) for p in planes], ndims=2)

    cfg = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=64, batch_size=2, planes=(0,),
                        input_files=(path,), synthetic=False,
                        random_access=False, max_points=256),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "c"),
                          log_dir=str(tmp_path / "l")),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state()
    m_h = run_inference(trainer, ts, path, str(tmp_path / "h.npz"),
                        streamed=False, export="dense")
    m_d = run_inference(trainer, ts, path, str(tmp_path / "d.npz"),
                        streamed=True, export="dense")
    m_s = run_inference(trainer, ts, path, str(tmp_path / "s.npz"),
                        streamed=True, export="sparse")
    # all paths agree, and the busy event's exported pixels far exceed
    # max_points=256 — a truncating wire could export at most ~336 total
    assert m_h["n_pixels"] == m_d["n_pixels"] == m_s["n_pixels"]
    assert m_h["n_pixels"] > 500
    zh = np.load(str(tmp_path / "h.npz"))
    for other in ("d", "s"):
        z = np.load(str(tmp_path / f"{other}.npz"))
        for k in zh.files:
            np.testing.assert_array_equal(zh[k], z[k], err_msg=(other, k))


def test_sparse_export_dedupes_colliding_points(tmp_path):
    """Duplicate coordinates in a plane: densify scatters last-wins, so
    the per-point sparse export must dedupe to the per-PIXEL view
    (round-3 review finding)."""
    from uresnet_tpu.data import events as ev

    coords = np.array([[10, 10], [12, 12], [10, 10], [20, 20]], np.int32)
    values = np.array([5.0, 7.0, 9.0, 0.0], np.float32)  # dup at (10,10);
    labels = np.array([1, 2, 2, 1], np.uint8)            # (20,20) zero-val
    path = str(tmp_path / "dup.usef")
    ev.write_events(path, [ev.SparseEvent([ev.SparsePlane(
        plane_id=0, shape=(64, 64), coords=coords, values=values,
        labels=labels)])], ndims=2)

    cfg = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=64, batch_size=1, planes=(0,),
                        input_files=(path,), synthetic=False,
                        random_access=False),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "c"),
                          log_dir=str(tmp_path / "l")),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state()
    m_h = run_inference(trainer, ts, path, str(tmp_path / "h.npz"),
                        streamed=False, export="dense")
    m_s = run_inference(trainer, ts, path, str(tmp_path / "s.npz"),
                        streamed=True, export="sparse")
    # 2 pixels survive: (10,10) once (last-wins value 9, label 2), (12,12);
    # (20,20) has zero value -> excluded
    assert m_h["n_pixels"] == m_s["n_pixels"] == 2
    zh, zs = np.load(str(tmp_path / "h.npz")), np.load(str(tmp_path / "s.npz"))
    for k in zh.files:
        np.testing.assert_array_equal(zh[k], zs[k], err_msg=k)
    assert zs["label"].tolist() == [2, 2]    # last-wins at (10,10)


def test_tiled_matches_sparse_export_when_single_window(tmp_path):
    """When the detector plane IS one window (shape == image_size), the
    tiled pass degenerates to a single origin-0 tile and must reproduce the
    standard sparse-export pass byte-for-byte (npz AND usef): the standard
    crop also clamps to origin 0 there, so window coords == original
    detector coords."""
    path = generate_file(str(tmp_path / "one.usef"), 5, seed=41,
                         shape=(64, 64), planes=(0,))
    cfg = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=64, batch_size=2, planes=(0,),
                        input_files=(path,), synthetic=False,
                        random_access=False),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "c"),
                          log_dir=str(tmp_path / "l")),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state()
    m_std = run_inference(trainer, ts, path, str(tmp_path / "std.npz"))
    m_til = run_inference(trainer, ts, path, str(tmp_path / "til.npz"),
                          tiled=True)
    assert m_til["n_tiles"] == 5                 # one tile per event/plane
    assert m_std["n_pixels"] == m_til["n_pixels"]
    zs, zt = np.load(str(tmp_path / "std.npz")), np.load(str(tmp_path / "til.npz"))
    for k in zs.files:
        np.testing.assert_array_equal(zs[k], zt[k], err_msg=k)
    run_inference(trainer, ts, path, str(tmp_path / "std.usef"), fmt="usef")
    run_inference(trainer, ts, path, str(tmp_path / "til.usef"), fmt="usef",
                  tiled=True)
    with open(str(tmp_path / "std.usef"), "rb") as f:
        sb = f.read()
    with open(str(tmp_path / "til.usef"), "rb") as f:
        tb = f.read()
    assert sb == tb


def test_tiled_covers_full_plane(setup):
    """Full-coverage contract: on 128^2 events scored through a 64^2 model
    window, the tiled pass exports EVERY positive charge pixel (the
    single-crop pass drops everything outside its centered window), and
    each point's scores equal a numpy-densified per-tile forward oracle."""
    from uresnet_tpu.data import events as ev

    trainer, ts, path, tmp = setup
    S = trainer.cfg.data.image_size               # 64; plane shape is 128^2
    scale = trainer.cfg.data.normalize_scale
    clip = trainer.cfg.data.normalize_clip
    m_std = run_inference(trainer, ts, path, str(tmp / "cov_std.npz"))
    m_til = run_inference(trainer, ts, path, str(tmp / "cov_til.npz"),
                          tiled=True)
    # expected pixel count: dedupe by pixel last-wins, positive normalized
    events = ev.read_events(path)
    n_expect = 0
    for evt in events:
        for pl in evt.planes:
            if pl.plane_id not in (0, 1):
                continue
            flat = pl.coords[:, 0].astype(np.int64) * 128 + pl.coords[:, 1]
            vals = np.zeros(128 * 128, np.float32)
            vals[flat] = pl.values                 # last-wins
            n_expect += int((np.clip(vals * scale, 0, clip) > 0).sum())
    assert m_til["n_pixels"] == n_expect
    assert m_std["n_pixels"] < n_expect            # the crop has a blind spot
    assert m_til["n_tiles"] > len(events) * 2      # events span several tiles

    # score oracle: per owned tile, numpy-densify the window (context
    # points included) and run the plain forward
    zt = np.load(str(tmp / "cov_til.npz"))
    for evt_i, evt in enumerate(events[:2]):       # first 2 events suffice
        for pl in evt.planes:
            if pl.plane_id not in (0, 1):
                continue
            c = pl.coords.astype(np.int64)
            tile = np.minimum(c // S, 1)           # ks = [2, 2] at 128/64
            owner = tile[:, 0] * 2 + tile[:, 1]
            sel_evt = (zt["event_id"] == evt_i) & (zt["plane_id"] == pl.plane_id)
            exp_coords = zt["coords"][sel_evt]
            exp_scores = zt["scores"][sel_evt]
            for tid in np.unique(owner):
                o = np.array([(tid // 2) * S, (tid % 2) * S])
                ctx = np.all((c >= o) & (c < o + S), axis=1)
                data = np.zeros((S, S), np.float32)
                w = (c[ctx] - o)
                data[w[:, 0], w[:, 1]] = np.clip(
                    pl.values[ctx] * scale, 0, clip)
                sc = np.asarray(trainer.forward(
                    ts, data[None, :, :, None]))[0]
                own_pix = (exp_coords >= o).all(1) & (exp_coords < o + S).all(1)
                ww = exp_coords[own_pix] - o
                np.testing.assert_allclose(
                    exp_scores[own_pix], sc[ww[:, 0], ww[:, 1]],
                    rtol=1e-4, atol=1e-5)


def test_tiled_usef_scores_every_point(setup):
    """Tiled usef writeback carries ALL points of every plane in file order
    (the standard writeback keeps only in-window points)."""
    from uresnet_tpu.data import events as ev
    from uresnet_tpu.engine.evaluator import score_plane_id

    trainer, ts, path, tmp = setup
    out = str(tmp / "cov.usef")
    run_inference(trainer, ts, path, out, fmt="usef", tiled=True)
    back = ev.read_events(out)
    inputs = ev.read_events(path)
    num_class = trainer.cfg.model.num_class
    for evt_in, evt_out in zip(inputs, back):
        by_id = {p.plane_id: p for p in evt_out.planes}
        for pin in evt_in.planes:
            if pin.plane_id not in (0, 1):
                continue
            for cls in range(num_class):
                cp = by_id[score_plane_id(pin.plane_id, cls, num_class)]
                np.testing.assert_array_equal(cp.coords, pin.coords)
            total = sum(
                by_id[score_plane_id(pin.plane_id, cls, num_class)]
                .values.astype(np.float64) for cls in range(num_class))
            np.testing.assert_allclose(total, 1.0, rtol=1e-3)


def test_tiled_3d_covers_full_volume(tmp_path):
    """The tile cover is dimension-generic: 64^3 events scored through a
    32^3 model window export EVERY positive charge voxel with original
    detector coords, and each exported voxel's scores match a numpy
    per-tile forward oracle."""
    from uresnet_tpu.data import events as ev

    path = generate_file(str(tmp_path / "v3.usef"), 3, seed=7,
                         shape=(64, 64, 64), planes=(0,))
    cfg = Config(
        model=ModelConfig(dims=3, depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=32, batch_size=2, planes=(0,),
                        input_files=(path,), synthetic=False,
                        random_access=False, max_points=4096),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "c"),
                          log_dir=str(tmp_path / "l")),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state()
    m = run_inference(trainer, ts, path, str(tmp_path / "t3.npz"),
                      tiled=True)
    scale = cfg.data.normalize_scale
    clip = cfg.data.normalize_clip
    events = ev.read_events(path)
    n_expect = 0
    for evt in events:
        pl = evt.planes[0]
        flat = (pl.coords[:, 0].astype(np.int64) * 64 * 64
                + pl.coords[:, 1].astype(np.int64) * 64 + pl.coords[:, 2])
        vals = np.zeros(64 ** 3, np.float32)
        vals[flat] = pl.values                     # last-wins
        n_expect += int((np.clip(vals * scale, 0, clip) > 0).sum())
    assert m["n_pixels"] == n_expect
    assert m["n_tiles"] > len(events)              # events span several tiles
    zt = np.load(str(tmp_path / "t3.npz"))
    assert zt["coords"].shape[1] == 3
    assert zt["coords"].max() >= 32                # beyond one window
    np.testing.assert_allclose(zt["scores"].sum(1), 1.0, rtol=1e-4)
    # oracle: one event, per owned tile, numpy-densify + plain forward
    S = 32
    evt = events[0]
    pl = evt.planes[0]
    c = pl.coords.astype(np.int64)
    tile = np.minimum(c // S, 1)                   # ks = [2,2,2] at 64/32
    owner = (tile[:, 0] * 2 + tile[:, 1]) * 2 + tile[:, 2]
    sel_evt = zt["event_id"] == 0
    exp_coords = zt["coords"][sel_evt]
    exp_scores = zt["scores"][sel_evt]
    for tid in np.unique(owner):
        o = np.array([(tid // 4) % 2, (tid // 2) % 2, tid % 2]) * S
        ctx = np.all((c >= o) & (c < o + S), axis=1)
        data = np.zeros((S, S, S), np.float32)
        w = c[ctx] - o
        data[w[:, 0], w[:, 1], w[:, 2]] = np.clip(
            pl.values[ctx] * scale, 0, clip)
        sc = np.asarray(trainer.forward(ts, data[None, ..., None]))[0]
        own_pix = (exp_coords >= o).all(1) & (exp_coords < o + S).all(1)
        ww = exp_coords[own_pix] - o
        np.testing.assert_allclose(
            exp_scores[own_pix], sc[ww[:, 0], ww[:, 1], ww[:, 2]],
            rtol=1e-4, atol=1e-5)


def test_tiled_on_dp_mesh_matches_single_device(tmp_path):
    """The tiled pass under the 8-device DP mesh: tile rows shard over the
    data axis (row_valid masks the padded tail rows per batch) and the
    export matches the 1-device tiled export."""
    import dataclasses

    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from uresnet_tpu.config import ParallelConfig

    path = generate_file(str(tmp_path / "dp.usef"), 6, seed=23,
                         shape=(128, 128), planes=(0,))
    base = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=64, batch_size=8, planes=(0,),
                        input_files=(path,), synthetic=False,
                        random_access=False),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "c"),
                          log_dir=str(tmp_path / "l")),
    )
    tr1 = Trainer(base, mesh=make_mesh(1))
    ts1 = tr1.init_state()
    m1 = run_inference(tr1, ts1, path, str(tmp_path / "d1.npz"), tiled=True)
    cfg8 = dataclasses.replace(base, parallel=ParallelConfig(data=8))
    tr8 = Trainer(cfg8)
    ts8 = tr8.init_state()
    m8 = run_inference(tr8, ts8, path, str(tmp_path / "d8.npz"), tiled=True)
    assert m1["n_pixels"] == m8["n_pixels"]
    assert m1["n_tiles"] == m8["n_tiles"]
    z1, z8 = np.load(str(tmp_path / "d1.npz")), np.load(str(tmp_path / "d8.npz"))
    for k in ("event_id", "plane_id", "coords", "pred", "label"):
        np.testing.assert_array_equal(z1[k], z8[k], err_msg=k)
    np.testing.assert_allclose(z1["scores"], z8["scores"],
                               rtol=1e-5, atol=1e-6)


def test_infer_cli_rejects_tiled_metrics_only():
    from uresnet_tpu.cli import infer as infer_cli

    with pytest.raises(SystemExit):
        infer_cli.main(["--tiled", "--metrics-only", "--platform", "cpu"])


def test_infer_cli_rejects_tiled_with_explicit_export():
    """--tiled has exactly one readback mode; silently ignoring an explicit
    --export dense would hand back different export/metric semantics than
    asked for (round-3 review)."""
    from uresnet_tpu.cli import infer as infer_cli

    with pytest.raises(SystemExit):
        infer_cli.main(["--tiled", "--export", "dense", "--input", "x.usef",
                        "--platform", "cpu"])


def test_resolve_input_files_literal_bracket_filename(tmp_path):
    """A real file whose NAME contains glob metacharacters ('[') must stay
    addressable: existing literal paths win over wildcard interpretation
    (round-3 review — '[2024]' would otherwise parse as a character class
    matching nothing)."""
    from uresnet_tpu.data.loader import resolve_input_files

    path = str(tmp_path / "run[2024].usef")
    generate_file(path, 1, seed=3, shape=(64, 64), planes=(0,))
    cfg = DataConfig(input_files=(path,), synthetic=False)
    assert resolve_input_files(cfg, 2) == [path]


def test_tiled_clamped_tiles_overlap(tmp_path):
    """Detector extents that are NOT multiples of image_size (the realistic
    LArTPC case — wire planes are not power-of-two multiples of the crop)
    take _tile_rows_for_plane's clamped-origin branch: the last tile per
    dimension shifts back to the detector edge (origin min(i*S, shape-S)),
    so neighbouring windows OVERLAP and points ride along as context in a
    window they are not owned by. Every positive pixel must still be
    exported exactly once, with scores equal to a numpy forward oracle over
    its OWNING tile's clamped window (round-3 review: all prior coverage
    tests used exact-multiple detectors with zero overlap)."""
    from uresnet_tpu.data import events as ev

    S, DET = 64, 100
    path = generate_file(str(tmp_path / "cl.usef"), 4, seed=17,
                         shape=(DET, DET), planes=(0,))
    cfg = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=S, batch_size=2, planes=(0,),
                        input_files=(path,), synthetic=False,
                        random_access=False),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "c"),
                          log_dir=str(tmp_path / "l")),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state()
    out = str(tmp_path / "cl.npz")
    m = run_inference(trainer, ts, path, out, tiled=True)
    scale, clip = cfg.data.normalize_scale, cfg.data.normalize_clip

    events = ev.read_events(path)
    n_expect = 0
    for evt in events:
        pl = evt.planes[0]
        flat = pl.coords[:, 0].astype(np.int64) * DET + pl.coords[:, 1]
        vals = np.zeros(DET * DET, np.float32)
        vals[flat] = pl.values                     # last-wins
        n_expect += int((np.clip(vals * scale, 0, clip) > 0).sum())
    assert m["n_pixels"] == n_expect               # full coverage

    z = np.load(out)
    # exactly-once: no (event, pixel) exported twice despite the overlap
    key = (z["event_id"].astype(np.int64) * DET
           + z["coords"][:, 0]) * DET + z["coords"][:, 1]
    assert len(np.unique(key)) == len(key)

    # per-tile forward oracle with CLAMPED origins [0, DET-S]
    origins = [0, DET - S]
    saw_context = False
    for evt_i, evt in enumerate(events):
        pl = evt.planes[0]
        c = pl.coords.astype(np.int64)
        owner = (np.minimum(c[:, 0] // S, 1) * 2
                 + np.minimum(c[:, 1] // S, 1))
        selz = z["event_id"] == evt_i
        exp_coords = z["coords"][selz].astype(np.int64)
        exp_scores = z["scores"][selz]
        exp_owner = (np.minimum(exp_coords[:, 0] // S, 1) * 2
                     + np.minimum(exp_coords[:, 1] // S, 1))
        for tid in range(4):
            o = np.array([origins[tid // 2], origins[tid % 2]])
            ctx = np.all((c >= o) & (c < o + S), axis=1)
            if not ctx.any():
                continue
            if (owner[ctx] != tid).any():
                saw_context = True                 # overlap carried context
            data = np.zeros((S, S), np.float32)
            w = c[ctx] - o
            data[w[:, 0], w[:, 1]] = np.clip(pl.values[ctx] * scale, 0, clip)
            sc = np.asarray(trainer.forward(ts, data[None, :, :, None]))[0]
            own_pix = exp_owner == tid
            ww = exp_coords[own_pix] - o
            assert ((ww >= 0) & (ww < S)).all()    # owned => inside window
            np.testing.assert_allclose(
                exp_scores[own_pix], sc[ww[:, 0], ww[:, 1]],
                rtol=1e-4, atol=1e-5)
    assert saw_context                             # the overlap was real


def test_evaluate_dataset_exact_multi_file_glob(tmp_path):
    """The exactly-once gate spans multiple input files addressed by one
    glob pattern: every event of every matched file counted exactly once."""
    from uresnet_tpu.config import Config as C

    generate_file(str(tmp_path / "h1.usef"), 3, seed=31, shape=(64, 64),
                  planes=(0,))
    generate_file(str(tmp_path / "h2.usef"), 4, seed=32, shape=(64, 64),
                  planes=(0,))
    cfg = C(model=ModelConfig(depth=2, base_filters=4,
                              compute_dtype="float32"),
            data=DataConfig(image_size=32, batch_size=2, planes=(0,),
                            input_files=(str(tmp_path / "h*.usef"),),
                            synthetic=False, random_access=False),
            train=TrainConfig(checkpoint_dir=str(tmp_path / "ck"),
                              log_dir=str(tmp_path / "lg")))
    trainer = Trainer(cfg, mesh=make_mesh(1))
    m = evaluate_dataset(trainer, trainer.init_state())
    assert m["n_events"] == 7
    assert m["n_pixels"] == 7 * 32 * 32
