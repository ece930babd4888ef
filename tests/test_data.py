import numpy as np
import pytest

from uresnet_tpu.config import DataConfig
from uresnet_tpu.data.events import (SparseEvent, SparsePlane, num_events,
                                     read_events, write_events)
from uresnet_tpu.data.loader import BatchLoader
from uresnet_tpu.data.pipeline import (crop_or_pad_coords, densify_batch,
                                       densify_plane, make_weights)
from uresnet_tpu.data.synthetic import generate_event, generate_file


def _event(rng, shape=(128, 128), planes=(0, 1)):
    return generate_event(rng, shape=shape, planes=planes, noise_points=10)


def test_usef_roundtrip(tmp_path, rng):
    events = [_event(rng) for _ in range(5)]
    path = str(tmp_path / "e.usef")
    write_events(path, events, ndims=2)
    assert num_events(path) == 5
    back = read_events(path)
    for a, b in zip(events, back):
        assert len(a.planes) == len(b.planes)
        for pa, pb in zip(a.planes, b.planes):
            assert pa.plane_id == pb.plane_id
            assert tuple(pa.shape) == tuple(pb.shape)
            np.testing.assert_array_equal(pa.coords, pb.coords)
            np.testing.assert_array_equal(pa.values, pb.values)
            np.testing.assert_array_equal(pa.labels, pb.labels)


def test_usef_random_access(tmp_path, rng):
    events = [_event(rng) for _ in range(6)]
    path = str(tmp_path / "e.usef")
    write_events(path, events, ndims=2)
    sel = read_events(path, [4, 1])
    np.testing.assert_array_equal(sel[0].planes[0].values,
                                  events[4].planes[0].values)
    np.testing.assert_array_equal(sel[1].planes[0].values,
                                  events[1].planes[0].values)


def test_usef_truncated_index_raises(tmp_path, rng):
    """An index truncated at an 8-byte boundary must raise, not silently
    present as a shorter valid-looking file (the C++ reader already fails
    loudly on the same short read)."""
    events = [_event(rng) for _ in range(4)]
    path = str(tmp_path / "t.usef")
    write_events(path, events, ndims=2)
    data = open(path, "rb").read()
    trunc = str(tmp_path / "trunc.usef")
    with open(trunc, "wb") as f:
        f.write(data[:4 + 16 + 8 * 2])  # magic+header, 2 of 4 offsets
    with pytest.raises(ValueError, match="truncated USEF index"):
        num_events(trunc)


def test_crop_centroid_is_sequential_f64(rng):
    """The crop-origin spec is a SEQUENTIAL float64 centroid accumulation in
    file order — the exact computation the C++ decoder's double loop
    performs, so both producers agree even at floor() half-integer
    boundaries (round-3 review: an f32 pairwise values.sum() could differ).
    Pin numpy against a literal Python loop."""
    import math

    for _ in range(5):
        n = int(rng.integers(3, 200))
        coords = rng.integers(0, 3000, size=(n, 2)).astype(np.int32)
        values = (rng.random(n) * 100).astype(np.float32)
        shifted, mask = crop_or_pad_coords(coords, (4096, 4096), 64,
                                           values=values)
        # literal sequential-double reference (the C++ loop)
        vsum = 0.0
        for v in values:
            vsum += float(v)
        center = [0.0, 0.0]
        for i in range(n):
            w = float(values[i]) / vsum
            for d in range(2):
                center[d] += w * float(coords[i, d])
        anchor = coords[int(np.argmax(values))]
        origin = []
        for d in range(2):
            lo = int(math.floor(center[d] - 32 + 0.5))
            lo = max(int(anchor[d]) - 63, min(lo, int(anchor[d])))
            lo = max(0, min(lo, 4096 - 64))
            origin.append(lo)
        np.testing.assert_array_equal(
            shifted, coords.astype(np.int64) - np.asarray(origin)[None, :])


def test_sparse_batch_rejects_negative_labels(rng):
    """Negative labels must fail loudly, not wrap through the uint8 wire
    (round-3 review finding)."""
    from uresnet_tpu.data.pipeline import sparse_batch

    ev_ = _event(rng, shape=(64, 64), planes=(0,))
    bad = SparsePlane(plane_id=0, shape=(64, 64),
                      coords=ev_.planes[0].coords[:4],
                      values=ev_.planes[0].values[:4],
                      labels=np.array([1, -1, 0, 2], np.int32))
    with pytest.raises(ValueError, match="outside"):
        sparse_batch([SparseEvent(planes=[bad])], planes=(0,),
                     max_points=16, ndims=2)


def test_crop_or_pad_centers_charge():
    coords = np.array([[100, 100], [101, 102]], np.int32)
    shifted, mask = crop_or_pad_coords(coords, (512, 512), 64)
    assert mask.all()
    assert (shifted >= 0).all() and (shifted < 64).all()


def test_crop_window_clamps_to_image():
    coords = np.array([[0, 0], [1, 1]], np.int32)
    shifted, mask = crop_or_pad_coords(coords, (512, 512), 64)
    assert mask.all()
    np.testing.assert_array_equal(shifted, coords)  # origin clamped to 0


def test_weight_modes():
    labels = np.zeros((8, 8), np.int32)
    labels[0, :4] = 1
    labels[1, :2] = 2
    data = (labels > 0).astype(np.float32)
    w1 = make_weights(labels, data, mode="ones", num_class=3)
    assert (w1 == 1).all()
    w2 = make_weights(labels, data, mode="nonzero", num_class=3,
                      nonzero_boost=3.0)
    assert w2[0, 0] == 4.0 and w2[7, 7] == 1.0
    w3 = make_weights(labels, data, mode="class_balance", num_class=3)
    # rarer class -> larger weight; weights within a class are constant
    assert w3[1, 0] > w3[0, 0] > w3[7, 7]
    # mean-normalized-ish: total weight = total pixels (each class contributes
    # total/num_class)
    assert abs(w3.sum() - labels.size) < 1e-3


def test_densify_shapes_and_normalize(rng):
    ev = _event(rng, shape=(128, 128), planes=(0,))
    d, l, w = densify_plane(ev.planes[0], image_size=64, normalize_scale=0.01,
                            normalize_clip=0.5, weight_mode="ones", num_class=3)
    assert d.shape == (64, 64) and l.shape == (64, 64) and w.shape == (64, 64)
    assert d.max() <= 0.5
    assert set(np.unique(l)).issubset({0, 1, 2})
    # labels nonzero only where charge (plus background-label noise pixels)
    assert (d[l > 0] > 0).all()


def test_densify_batch_multiplane(rng):
    events = [_event(rng, planes=(0, 1)) for _ in range(2)]
    b = densify_batch(events, image_size=64, planes=(0, 1))
    assert b["data"].shape == (4, 64, 64, 1)
    assert b["label"].shape == (4, 64, 64)
    assert b["weight"].shape == (4, 64, 64)


def test_loader_sync_and_threaded(tmp_path, rng):
    path = generate_file(str(tmp_path / "s.usef"), 8, seed=1,
                         shape=(128, 128), planes=(0,))
    cfg = DataConfig(image_size=64, batch_size=4, planes=(0,),
                     input_files=(path,), synthetic=False, num_threads=2,
                     seed=3, transfer="dense")
    loader = BatchLoader(cfg, num_class=3)
    b = loader.next()  # sync path
    assert b["data"].shape == (4, 64, 64, 1)
    loader.start(2)
    b2 = loader.next()
    assert b2["data"].shape == (4, 64, 64, 1)
    loader.stop()


def test_loader_cursor_seek_deterministic(tmp_path):
    path = generate_file(str(tmp_path / "s.usef"), 8, seed=1,
                         shape=(128, 128), planes=(0,))
    cfg = DataConfig(image_size=64, batch_size=2, planes=(0,),
                     input_files=(path,), synthetic=False,
                     random_access=False, transfer="dense")
    a = BatchLoader(cfg, num_class=3)
    _ = a.next()
    b1 = a.next()
    b = BatchLoader(cfg, num_class=3)
    b.seek(2)
    b2 = b.next()
    np.testing.assert_array_equal(b1["data"], b2["data"])


def test_loader_deterministic_across_threads(tmp_path):
    """Ticket-ordered delivery: the batch stream (and each batch's cursor)
    must be identical for any producer thread count."""
    path = generate_file(str(tmp_path / "t.usef"), 10, seed=2,
                         shape=(128, 128), planes=(0,))
    cfg = DataConfig(image_size=64, batch_size=2, planes=(0,),
                     input_files=(path,), synthetic=False,
                     random_access=True, seed=7, transfer="dense",
                     num_batch_storage=3)
    outs = []
    for threads in (1, 3):
        lo = BatchLoader(cfg, num_class=3).start(threads)
        outs.append([lo.next() for _ in range(8)])
        lo.stop()
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a["data"], b["data"])
        assert int(a["cursor"]) == int(b["cursor"])


def test_loader_epoch_boundary_resume(tmp_path):
    """Resume PAST an epoch boundary replays the later epoch's shuffle
    (cursor is absolute: epoch = cursor // n_events)."""
    path = generate_file(str(tmp_path / "e.usef"), 6, seed=4,
                         shape=(128, 128), planes=(0,))
    cfg = DataConfig(image_size=64, batch_size=4, planes=(0,),
                     input_files=(path,), synthetic=False,
                     random_access=True, seed=9, transfer="dense")
    a = BatchLoader(cfg, num_class=3)
    batches = [a.next() for _ in range(4)]  # positions 0..15: epochs 0..2
    c = int(batches[1]["cursor"])
    assert c == 8  # absolute, not mod-6
    b = BatchLoader(cfg, num_class=3, start_event=c)
    for k in (2, 3):
        nb = b.next()
        np.testing.assert_array_equal(batches[k]["data"], nb["data"])
        assert int(nb["cursor"]) == int(batches[k]["cursor"])


def test_loader_epochs_reshuffle(tmp_path):
    """Consecutive epochs must visit events in different orders."""
    from uresnet_tpu.data.loader import epoch_order

    o0 = epoch_order(32, seed=3, epoch=0, shuffle=True)
    o1 = epoch_order(32, seed=3, epoch=1, shuffle=True)
    assert not np.array_equal(o0, o1)
    assert sorted(o0) == sorted(o1) == list(range(32))
    np.testing.assert_array_equal(
        epoch_order(32, 3, 1, True), o1)  # pure function of (seed, epoch)


def test_loader_multifile_preserves_order(tmp_path):
    """Rows must follow the sampled event order even when events span
    multiple files (the C++ decoder emits strict index-order rows)."""
    import dataclasses

    p1 = generate_file(str(tmp_path / "m1.usef"), 4, seed=1,
                       shape=(128, 128), planes=(0,))
    p2 = generate_file(str(tmp_path / "m2.usef"), 4, seed=2,
                       shape=(128, 128), planes=(0,))
    cfg = DataConfig(image_size=64, batch_size=4, planes=(0,),
                     input_files=(p1, p2), synthetic=False,
                     random_access=True, seed=3, transfer="dense")
    b = BatchLoader(cfg, num_class=3).next()
    # oracle: batch_size=1 batches walk the same stream one event at a time
    lo1 = BatchLoader(dataclasses.replace(cfg, batch_size=1), num_class=3)
    for r in range(4):
        rb = lo1.next()
        np.testing.assert_array_equal(b["data"][r], rb["data"][0])


def test_loader_rejects_batch_not_multiple_of_planes(tmp_path):
    path = generate_file(str(tmp_path / "bb.usef"), 4, seed=1,
                         shape=(128, 128), planes=(0, 1))
    cfg = DataConfig(image_size=64, batch_size=5, planes=(0, 1),
                     input_files=(path,), synthetic=False)
    with pytest.raises(ValueError, match="multiple"):
        BatchLoader(cfg, num_class=3)


def test_synthetic_has_all_classes(rng):
    ev = _event(rng, shape=(256, 256), planes=(0,))
    labs = ev.planes[0].labels
    assert {1, 2}.issubset(set(np.unique(labs)))


def test_loader_stop_start_resumes_deterministically(tmp_path):
    """stop() -> start() must continue the exact stream (claimed-but-
    undelivered tickets are rewound, not leaked as holes that hang the
    consumer — round-2 review finding)."""
    from uresnet_tpu.config import DataConfig
    from uresnet_tpu.data.loader import BatchLoader

    cfg = DataConfig(image_size=32, batch_size=2, planes=(0,),
                     synthetic=True, synthetic_events=8, seed=3,
                     num_threads=2, random_access=True, transfer="sparse",
                     max_points=256)
    from uresnet_tpu.data.loader import resolve_input_files
    files = tuple(resolve_input_files(cfg, 2))
    import dataclasses
    cfg = dataclasses.replace(cfg, input_files=files)

    ref = BatchLoader(cfg, num_class=3, train=True, ndims=2)
    want = [ref._make_batch() for _ in range(6)]   # synchronous oracle

    ld = BatchLoader(cfg, num_class=3, train=True, ndims=2)
    ld.start(2)
    got = [ld.next() for _ in range(3)]
    ld.stop()
    ld.start(2)                                    # restart mid-stream
    got += [ld.next() for _ in range(3)]
    ld.stop()
    for w, g in zip(want, got):
        assert w["cursor"] == g["cursor"]
        np.testing.assert_array_equal(w["values"], g["values"])


def test_loader_straggler_cannot_claim_while_stopped(tmp_path):
    """A worker that outlives stop()'s bounded join and resumes AFTER the
    rewind must not be issued a ticket: it would take ticket 0 of the NEW
    generation, then discard its batch on the _stop check — a permanent
    hole at ticket 0 that deadlocks next() after restart (round-3 review
    finding). _claim() must refuse while stopped; the post-restart stream
    must still be exact."""
    import dataclasses
    from uresnet_tpu.config import DataConfig
    from uresnet_tpu.data.loader import BatchLoader, resolve_input_files

    cfg = DataConfig(image_size=32, batch_size=2, planes=(0,),
                     synthetic=True, synthetic_events=8, seed=3,
                     num_threads=2, random_access=True, transfer="sparse",
                     max_points=256)
    cfg = dataclasses.replace(cfg, input_files=tuple(resolve_input_files(cfg, 2)))

    ref = BatchLoader(cfg, num_class=3, train=True, ndims=2)
    want = [ref._make_batch() for _ in range(4)]   # synchronous oracle

    ld = BatchLoader(cfg, num_class=3, train=True, ndims=2)
    ld.start(2)
    got = [ld.next() for _ in range(2)]
    ld.stop()
    # The straggler's next act after stop()+rewind is a claim. It must be
    # refused — NOT handed ticket 0 of the restarted stream.
    assert ld._claim() is None
    assert ld._next_ticket == 0 and ld._next_consume == 0
    ld.start(2)                                    # restart: no hole at 0
    got += [ld.next() for _ in range(2)]
    ld.stop()
    for w, g in zip(want, got):
        assert w["cursor"] == g["cursor"]
        np.testing.assert_array_equal(w["values"], g["values"])


def test_cxx_seek_requires_stopped_loader(tmp_path):
    from uresnet_tpu.data import cxx_decoder
    if not cxx_decoder.available():
        import pytest as _pytest
        _pytest.skip("liburesnet_decoder.so not built — run `make -C cxx/decoder`")
    from uresnet_tpu.config import DataConfig
    from uresnet_tpu.data.loader import resolve_input_files

    cfg = DataConfig(image_size=32, batch_size=2, planes=(0,),
                     synthetic=True, synthetic_events=8, seed=3,
                     num_threads=1, transfer="sparse", max_points=256)
    files = resolve_input_files(cfg, 2)
    ld = cxx_decoder.CxxBatchLoader(cfg, num_class=3, train=True, ndims=2,
                                    files=files)
    ld.start(1)
    ld.next()
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="stopped"):
        ld.seek(0)
    ld.stop()
    ld.close()


# ---------------------------------------------------------------------------
# USEF v2: per-point file weights (the reference's weight product)
# ---------------------------------------------------------------------------


def _weighted_event(rng, shape=(128, 128), planes=(0, 1)):
    """Synthetic event with a stored per-point weight on every plane."""
    evt = _event(rng, shape=shape, planes=planes)
    for pl in evt.planes:
        pl.weights = rng.uniform(0.1, 5.0, len(pl.values)).astype(np.float32)
    return evt


def test_usef_v2_roundtrip(tmp_path, rng):
    events = [_weighted_event(rng) for _ in range(4)]
    events[2].planes[1].weights = None       # per-plane flag: mixed is legal
    path = str(tmp_path / "w.usef")
    write_events(path, events, ndims=2)
    from uresnet_tpu.data.events import read_header
    assert read_header(path)[0] == 2         # weights present -> version 2
    back = read_events(path)
    for a, b in zip(events, back):
        for pa, pb in zip(a.planes, b.planes):
            np.testing.assert_array_equal(pa.coords, pb.coords)
            np.testing.assert_array_equal(pa.values, pb.values)
            np.testing.assert_array_equal(pa.labels, pb.labels)
            if pa.weights is None:
                assert pb.weights is None
            else:
                np.testing.assert_array_equal(pa.weights, pb.weights)


def test_usef_weightless_stays_v1(tmp_path, rng):
    """No weights anywhere -> byte-identical v1 output (old readers and
    round-2 goldens unaffected)."""
    events = [_event(rng) for _ in range(2)]
    path = str(tmp_path / "v1.usef")
    write_events(path, events, ndims=2)
    from uresnet_tpu.data.events import read_header
    assert read_header(path)[0] == 1


def test_densify_file_weight_mode(rng):
    evt = _weighted_event(rng, planes=(0,))
    pl = evt.planes[0]
    d, l, w = densify_plane(pl, image_size=64, normalize_scale=0.01,
                            normalize_clip=10.0, weight_mode="file",
                            num_class=3)
    # background pixels -> 1.0; charge pixels -> the stored weight
    shifted, mask = crop_or_pad_coords(pl.coords, pl.shape, 64,
                                       values=pl.values)
    idx = tuple(shifted[mask].T)
    np.testing.assert_array_equal(w[idx], pl.weights[mask])
    untouched = np.ones((64, 64), bool)
    untouched[idx] = False
    assert (w[untouched] == 1.0).all()


def test_densify_file_weight_mode_requires_weights(rng):
    evt = _event(rng, planes=(0,))
    with pytest.raises(ValueError, match="no stored weights"):
        densify_plane(evt.planes[0], image_size=64, normalize_scale=0.01,
                      normalize_clip=10.0, weight_mode="file", num_class=3)


def test_sparse_batch_carries_file_weights(rng):
    from uresnet_tpu.data.pipeline import sparse_batch

    events = [_weighted_event(rng, planes=(0, 1)) for _ in range(2)]
    sp = sparse_batch(events, planes=(0, 1), max_points=2048,
                      with_weights=True)
    assert sp["weights"].shape == sp["values"].shape
    n0 = sp["npoints"][0]
    np.testing.assert_array_equal(sp["weights"][0, :n0],
                                  events[0].planes[0].weights[:n0])
    assert (sp["weights"][0, n0:] == 0).all()          # padding


def test_sparse_batch_rejects_out_of_shape_coords(rng):
    from uresnet_tpu.data.pipeline import sparse_batch

    evt = _event(rng, planes=(0,))
    evt.planes[0].coords[0] = (5000, 5000)   # outside the 128x128 shape
    with pytest.raises(ValueError, match="outside the declared plane shape"):
        sparse_batch([evt], planes=(0,), max_points=2048)


def test_class_balance_rejects_label_overflow():
    pl = SparsePlane(
        plane_id=0, shape=(64, 64),
        coords=np.array([[10, 10], [12, 12]], np.int32),
        values=np.array([5.0, 7.0], np.float32),
        labels=np.array([1, 200], np.uint8))   # 200 >= num_class
    with pytest.raises(ValueError, match="num_class"):
        densify_plane(pl, image_size=64, normalize_scale=0.01,
                      normalize_clip=10.0, weight_mode="class_balance",
                      num_class=3)


def test_stack_batches_finite_iterator_ends_cleanly():
    """PEP 479: a bounded source must end the stacked stream, not raise
    RuntimeError (round-2 advisor finding)."""
    from uresnet_tpu.data.loader import stack_batches

    src = iter([{"x": np.ones(2), "cursor": np.int64(i)} for i in range(5)])
    groups = list(stack_batches(src, 2))
    assert len(groups) == 2                  # partial trailing group dropped
    assert groups[1]["cursor"] == 3


def test_max_plane_points_scans_and_filters(tmp_path, rng):
    """max_plane_points: metadata-only scan handles v1 AND v2 layouts, and
    the planes filter keeps an unselected busy plane from inflating the
    ana pad (round-3 review finding)."""
    from uresnet_tpu.data.events import max_plane_points

    def plane(pid, n):
        return SparsePlane(
            plane_id=pid, shape=(128, 128),
            coords=rng.integers(0, 128, (n, 2)).astype(np.int32),
            values=rng.uniform(1, 5, n).astype(np.float32),
            labels=np.zeros(n, np.uint8))

    events = [SparseEvent([plane(0, 40), plane(1, 900)]),
              SparseEvent([plane(0, 70), plane(1, 10)])]
    p1 = str(tmp_path / "v1.usef")
    write_events(p1, events, ndims=2)
    assert max_plane_points(p1) == 900
    assert max_plane_points(p1, planes=(0,)) == 70
    assert max_plane_points(p1, planes=(1,)) == 900
    # v2 layout (stored weights change the record framing)
    for evt in events:
        for pl in evt.planes:
            pl.weights = np.ones(len(pl.values), np.float32)
    p2 = str(tmp_path / "v2.usef")
    write_events(p2, events, ndims=2)
    assert max_plane_points(p2, planes=(0,)) == 70
    assert max_plane_points(p2) == 900


def test_resolve_input_files_glob(tmp_path):
    """Wildcard entries expand sorted; an empty expansion is a named
    error, and plain paths pass through untouched (even if absent —
    the reader raises later with its own message)."""
    from uresnet_tpu.data.loader import resolve_input_files

    p1 = generate_file(str(tmp_path / "run_b.usef"), 2, seed=1,
                       shape=(64, 64), planes=(0,))
    p2 = generate_file(str(tmp_path / "run_a.usef"), 2, seed=2,
                       shape=(64, 64), planes=(0,))
    cfg = DataConfig(input_files=(str(tmp_path / "run_*.usef"),),
                     synthetic=False)
    assert resolve_input_files(cfg, 2) == [p2, p1]  # sorted
    cfg2 = DataConfig(input_files=(p1, str(tmp_path / "run_?.usef")),
                      synthetic=False)
    assert resolve_input_files(cfg2, 2) == [p1, p2, p1]
    with pytest.raises(FileNotFoundError, match="matched no"):
        resolve_input_files(DataConfig(
            input_files=(str(tmp_path / "nope_*.usef"),),
            synthetic=False), 2)
    # a glob stream feeds a real loader end-to-end
    b = BatchLoader(DataConfig(image_size=64, batch_size=2, planes=(0,),
                               input_files=(str(tmp_path / "run_*.usef"),),
                               synthetic=False, random_access=False,
                               transfer="dense"), num_class=3).next()
    assert b["data"].shape[0] == 2
