"""C++ decoder vs numpy-pipeline equivalence (SURVEY.md §4 data-plane tests).

The native decoder must reproduce the Python pipeline bit-for-bit on
sequential access. Skipped when liburesnet_decoder.so hasn't been built
(`make -C cxx/decoder`).
"""

import numpy as np
import pytest

from uresnet_tpu.config import DataConfig
from uresnet_tpu.data import cxx_decoder
from uresnet_tpu.data.loader import BatchLoader
from uresnet_tpu.data.synthetic import generate_file

pytestmark = pytest.mark.skipif(not cxx_decoder.available(),
                                reason="liburesnet_decoder.so not built — run `make -C cxx/decoder` to cover the 16 C++ decoder tests")


@pytest.fixture(scope="module")
def usef_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("usef") / "events.usef"
    return generate_file(str(path), 12, seed=9, shape=(128, 128), planes=(0, 1))


def _cfg(path, **kw):
    base = dict(image_size=64, batch_size=4, planes=(0, 1),
                input_files=(path,), synthetic=False, random_access=False,
                weight_mode="class_balance", num_batch_storage=3,
                transfer="dense")
    base.update(kw)
    return DataConfig(**base)


def test_cxx_matches_python_bitexact(usef_file):
    cfg = _cfg(usef_file)
    py = BatchLoader(cfg, num_class=3)          # synchronous oracle
    cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(2)
    for _ in range(6):
        a = py.next()
        b = cx.next()
        np.testing.assert_array_equal(a["data"], b["data"])
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_array_equal(a["weight"], b["weight"])
    cx.stop(); cx.close()


@pytest.mark.parametrize("mode,boost", [("ones", 0.0), ("nonzero", 2.5)])
def test_cxx_weight_modes(usef_file, mode, boost):
    cfg = _cfg(usef_file, weight_mode=mode, weight_nonzero_boost=boost)
    py = BatchLoader(cfg, num_class=3)
    cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(1)
    a, b = py.next(), cx.next()
    np.testing.assert_array_equal(a["weight"], b["weight"])
    cx.stop(); cx.close()


def test_cxx_deterministic_across_threads(usef_file):
    cfg = _cfg(usef_file, random_access=True, seed=7)
    outs = []
    for threads in (1, 3):
        cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(threads)
        outs.append([cx.next()["data"] for _ in range(5)])
        cx.stop(); cx.close()
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a, b)


def test_cxx_sparse_matches_python(usef_file):
    cfg = _cfg(usef_file, transfer="sparse", max_points=2048)
    py = BatchLoader(cfg, num_class=3)
    cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(2)
    for _ in range(4):
        a = py.next()
        b = cx.next()
        for k in ("coords", "values", "labels", "npoints", "shape"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    cx.stop(); cx.close()


def test_cxx_seek_resume(usef_file):
    cfg = _cfg(usef_file)
    cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(1)
    _ = cx.next()
    b1 = cx.next()
    cursor_after_first = int(_["cursor"])
    cx.stop(); cx.close()

    cx2 = cxx_decoder.CxxBatchLoader(cfg, num_class=3,
                                     start_event=cursor_after_first).start(1)
    b2 = cx2.next()
    np.testing.assert_array_equal(b1["data"], b2["data"])
    cx2.stop(); cx2.close()


def test_cxx_matches_python_shuffled(usef_file):
    """Shared splitmix64 epoch shuffle: the C++ and Python producers emit
    the SAME shuffled stream (so resume may switch backends), across an
    epoch boundary (12 events, 2 events/batch, 8 batches)."""
    cfg = _cfg(usef_file, random_access=True, seed=13)
    py = BatchLoader(cfg, num_class=3)
    cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(2)
    for _ in range(8):
        a, b = py.next(), cx.next()
        np.testing.assert_array_equal(a["data"], b["data"])
        assert int(a["cursor"]) == int(b["cursor"])
    cx.stop(); cx.close()


def test_cxx_epoch_boundary_resume(usef_file):
    """Absolute cursor: resuming after an epoch boundary must replay that
    epoch's shuffle, bit-exactly."""
    cfg = _cfg(usef_file, random_access=True, seed=21)
    cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(1)
    batches = [cx.next() for _ in range(8)]
    cx.stop(); cx.close()
    c = int(batches[5]["cursor"])
    assert c == 12  # absolute: exactly one epoch of 12 events
    cx2 = cxx_decoder.CxxBatchLoader(cfg, num_class=3,
                                     start_event=c).start(1)
    for k in (6, 7):
        nb = cx2.next()
        np.testing.assert_array_equal(batches[k]["data"], nb["data"])
        assert int(nb["cursor"]) == int(batches[k]["cursor"])
    cx2.stop(); cx2.close()


def test_cxx_rejects_batch_not_multiple_of_planes(usef_file):
    """batch=5 over 2 planes used to hand numpy a 5-row view over a 4-row
    C++ slot buffer — now rejected up front."""
    cfg = _cfg(usef_file, batch_size=5)
    with pytest.raises(ValueError, match="multiple"):
        cxx_decoder.CxxBatchLoader(cfg, num_class=3)


def test_cxx_zero_copy_release(usef_file):
    cfg = _cfg(usef_file)
    cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(1)
    b = cx.next(copy=False)
    assert "slot" in b
    assert b["data"].shape == (4, 64, 64, 1)
    assert np.isfinite(b["data"]).all()
    cx.release(int(b["slot"]))  # hand the slot back for refill
    cx.stop(); cx.close()


# ---------------------------------------------------------------------------
# USEF v2 file weights + same-handle restart (round-3)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def weighted_usef_file(tmp_path_factory):
    from uresnet_tpu.data.events import read_events, write_events

    rng = np.random.default_rng(41)
    events = read_events(generate_file(
        str(tmp_path_factory.mktemp("usefw") / "base.usef"),
        10, seed=5, shape=(128, 128), planes=(0, 1)))
    for evt in events:
        for pl in evt.planes:
            pl.weights = rng.uniform(0.1, 4.0,
                                     len(pl.values)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("usefw") / "weighted.usef")
    write_events(path, events, ndims=2)
    return path


def test_cxx_file_weights_dense_bitexact(weighted_usef_file):
    cfg = _cfg(weighted_usef_file, weight_mode="file")
    py = BatchLoader(cfg, num_class=3)
    cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(2)
    for _ in range(4):
        a, b = py.next(), cx.next()
        np.testing.assert_array_equal(a["data"], b["data"])
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_array_equal(a["weight"], b["weight"])
    cx.stop(); cx.close()


def test_cxx_file_weights_sparse_bitexact(weighted_usef_file):
    cfg = _cfg(weighted_usef_file, weight_mode="file", transfer="sparse",
               max_points=2048)
    py = BatchLoader(cfg, num_class=3)
    cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(2)
    for _ in range(4):
        a, b = py.next(), cx.next()
        assert "weights" in a and "weights" in b
        for k in ("coords", "values", "labels", "weights", "npoints",
                  "shape"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    cx.stop(); cx.close()


def test_cxx_file_weights_require_v2(usef_file):
    """weight_mode='file' on a v1 (weightless) file must fail loudly in
    both producers, not silently degrade."""
    cfg = _cfg(usef_file, weight_mode="file")
    cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(1)
    with pytest.raises(RuntimeError, match="no stored weights"):
        cx.next()
    cx.stop(); cx.close()
    with pytest.raises(ValueError, match="no stored weights"):
        BatchLoader(cfg, num_class=3).next()


def test_cxx_rejects_out_of_shape_coords(tmp_path):
    """Corrupt coords must fail loudly before the int16 wire narrowing
    (round-2 advisor finding), matching the Python producer."""
    from uresnet_tpu.data.events import (SparseEvent, SparsePlane,
                                         read_events, write_events)

    events = read_events(generate_file(
        str(tmp_path / "ok.usef"), 4, seed=1, shape=(128, 128), planes=(0,)))
    bad = events[0].planes[0]
    bad.coords = bad.coords.copy()
    bad.coords[0] = (4000, 4000)  # outside the declared 128x128 shape
    path = str(tmp_path / "bad.usef")
    write_events(path, events, ndims=2)

    cfg = _cfg(path, planes=(0,), batch_size=2, transfer="sparse",
               max_points=2048)
    cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(1)
    with pytest.raises(RuntimeError, match="outside the declared plane"):
        cx.next()
    cx.stop(); cx.close()
    with pytest.raises(ValueError, match="outside the declared plane"):
        BatchLoader(cfg, num_class=3).next()


def test_cxx_rejects_corrupt_counts(tmp_path):
    """Absurd counts in a corrupt file must surface as loader ERRORS — the
    size-bounded validation rejects them before any resize could abort the
    process via std::bad_alloc (round-3 review finding)."""
    import struct

    from uresnet_tpu.data.events import read_header

    path = generate_file(str(tmp_path / "ok.usef"), 4, seed=2,
                         shape=(128, 128), planes=(0,))
    raw = open(path, "rb").read()
    off = int(read_header(path)[2][0])

    # corrupt EVENT: first plane's npoints (offset + num_planes(4) +
    # plane_id(4) + shape(8)) -> ~4 billion points
    bad_ev = str(tmp_path / "bad_event.usef")
    b = bytearray(raw)
    b[off + 16:off + 20] = struct.pack("<I", 0xFFFFFFFF)
    open(bad_ev, "wb").write(bytes(b))
    cfg = _cfg(bad_ev, planes=(0,), batch_size=2)
    cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(1)
    with pytest.raises(RuntimeError, match="decode"):
        cx.next()
    cx.stop(); cx.close()

    # corrupt HEADER: event count ~2^60 -> open fails loudly (both readers)
    bad_hdr = str(tmp_path / "bad_hdr.usef")
    b = bytearray(raw)
    b[12:20] = struct.pack("<Q", 1 << 60)
    open(bad_hdr, "wb").write(bytes(b))
    with pytest.raises(RuntimeError, match="header"):
        cxx_decoder.CxxBatchLoader(_cfg(bad_hdr, planes=(0,), batch_size=2),
                                   num_class=3)
    with pytest.raises(ValueError, match="truncated USEF index"):
        read_header(bad_hdr)


def test_cxx_same_handle_stop_seek_start(usef_file):
    """stop() -> seek() -> start() on the SAME handle resumes the exact
    deterministic stream (urd_stop rewinds the ticket/slot ring; a worker
    started after a stop used to exit immediately and hang urd_next —
    round-2 review finding)."""
    cfg = _cfg(usef_file, random_access=True, seed=31)
    ref = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(1)
    want = [ref.next() for _ in range(6)]
    ref.stop(); ref.close()

    cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(2)
    got = [cx.next() for _ in range(3)]
    cx.stop()
    cx.start(2)                               # plain restart mid-stream
    got += [cx.next() for _ in range(2)]
    cx.stop()
    cx.seek(int(want[1]["cursor"]))           # rewind to after batch 1
    cx.start(1)
    got_seek = cx.next()
    cx.stop(); cx.close()

    for w, g in zip(want, got):
        assert int(w["cursor"]) == int(g["cursor"])
        np.testing.assert_array_equal(w["data"], g["data"])
    np.testing.assert_array_equal(got_seek["data"], want[2]["data"])


def test_cxx_file_weights_shuffled_epoch_resume(weighted_usef_file):
    """File weights under the shuffled stream + same-handle restart: the
    weights leaf stays bit-exact across producers and across a
    stop/seek/start resume (weights must follow their events through the
    splitmix64 epoch shuffle)."""
    cfg = _cfg(weighted_usef_file, weight_mode="file", transfer="sparse",
               max_points=2048, random_access=True, seed=77)
    py = BatchLoader(cfg, num_class=3)
    cx = cxx_decoder.CxxBatchLoader(cfg, num_class=3).start(2)
    batches = []
    for _ in range(6):                       # crosses the 10-event epoch
        a, b = py.next(), cx.next()
        np.testing.assert_array_equal(a["weights"], b["weights"])
        np.testing.assert_array_equal(a["values"], b["values"])
        batches.append(b)
    cx.stop()
    cx.seek(int(batches[2]["cursor"]))       # same-handle rewind
    cx.start(1)
    again = cx.next()
    np.testing.assert_array_equal(again["weights"], batches[3]["weights"])
    cx.stop(); cx.close()
