"""USEF corruption fuzz sweep (SURVEY.md §4 data-plane edge cases, §5
failure detection): >= 50 deterministic corruptions of a valid file, each
fed to (a) the numpy reader + pipeline validators and (b) the C++ decoder
(when built). EVERY case must be rejected CLEANLY — a Python exception /
an error return code — never a crash, a hang, or silent acceptance of
garbage. The C++ sanitizer leg is the matching sweep in
cxx/decoder/selftest.cpp, run under `make -C cxx/decoder test tsan asan`.

Corpus layout knowledge (events.py write_events): header 20 bytes
(magic 4 | version u32 | ndims u32 | num_events u64), index 8 bytes/event,
then per event: num_planes u32 | per plane: plane_id u32, shape u32*nd,
npoints u32, coords i32*n*nd, values f32*n, labels u8*n. The base file has
2 events x 1 plane (id 0), shape (64, 64), 10/11 points -> event 0 at byte
36, its labels at 36+20+80+40.
"""

import struct

import numpy as np
import pytest

from uresnet_tpu.config import DataConfig
from uresnet_tpu.data import cxx_decoder
from uresnet_tpu.data import events as ev
from uresnet_tpu.data.loader import BatchLoader
from uresnet_tpu.data.pipeline import densify_batch, sparse_batch

EV0 = 36  # first event record: 20-byte header + 2 * 8-byte index entries


def _base_bytes(tmp_path) -> bytes:
    """Valid v1 file mirroring cxx/decoder/selftest.cpp write_test_file:
    2 events, 1 plane (id 0), 64x64, 10 and 11 points, labels in {1, 2}."""
    events = []
    for e in range(2):
        npts = 10 + e
        coords = np.array([[(e * 7 + i * 3) % 64, (e * 11 + i * 5) % 64]
                           for i in range(npts)], np.int32)
        values = np.array([10.0 + ((e + i) % 50) for i in range(npts)],
                          np.float32)
        labels = np.array([1 + (i % 2) for i in range(npts)], np.uint8)
        events.append(ev.SparseEvent([ev.SparsePlane(
            plane_id=0, shape=(64, 64), coords=coords, values=values,
            labels=labels)]))
    path = str(tmp_path / "base.usef")
    ev.write_events(path, events, ndims=2)
    with open(path, "rb") as f:
        return f.read()


def _p32(base: bytes, off: int, val: int) -> bytes:
    b = bytearray(base)
    struct.pack_into("<I", b, off, val)
    return bytes(b)


def _p64(base: bytes, off: int, val: int) -> bytes:
    b = bytearray(base)
    struct.pack_into("<Q", b, off, val)
    return bytes(b)


def _pbyte(base: bytes, off: int, val: int) -> bytes:
    b = bytearray(base)
    b[off] = val
    return bytes(b)


def _corpus(base: bytes):
    """(name, corrupted bytes, mode) — mode picks the validation wire the
    corruption targets: 'dense' (densify/class-balance), 'sparse' (int16
    wire + coord bounds), 'loader' (file-vs-model dimensionality)."""
    size = len(base)
    cases = []
    # 30 truncation points spread over the file: every strict prefix cuts
    # the header, the index, or the final event's payload
    for i in range(30):
        cases.append((f"trunc_{i}", base[: size * i // 30], "dense"))
    cases += [
        ("magic_x", b"X" + base[1:], "dense"),
        ("magic_zero", _p32(base, 0, 0), "dense"),
        ("version_0", _p32(base, 4, 0), "dense"),
        ("version_3", _p32(base, 4, 3), "dense"),
        ("ndims_0", _p32(base, 8, 0), "dense"),
        ("ndims_9", _p32(base, 8, 9), "dense"),
        # ndims=3 is in-bounds for the FORMAT but wrong for the 2D loader;
        # silent acceptance would mis-parse every plane record
        ("ndims_mismatch", _p32(base, 8, 3), "loader"),
        ("nevents_huge", _p64(base, 12, 2**64 - 1), "dense"),
        # the over-long index overlaps event payload; the garbage third
        # offset lands outside [hdr_end, size) -> offset bound
        ("nevents_plus1", _p64(base, 12, 3), "dense"),
        ("offset_zero", _p64(base, 20, 0), "dense"),
        ("offset_header", _p64(base, 20, 5), "dense"),
        ("offset_eof", _p64(base, 20, size), "dense"),
        ("offset_eof_minus1", _p64(base, 20, size - 1), "dense"),
        ("offset_2p63", _p64(base, 20, 1 << 63), "dense"),
        ("planes_huge", _p32(base, EV0, 0xFFFFFF), "dense"),
        ("npoints_huge", _p32(base, EV0 + 16, 0x7FFFFFFF), "dense"),
        # npoints+1 shifts the stream: the trailing coord pair is read from
        # float charge bytes (~0x41xxxxxx, far outside the 64-pixel shape)
        ("npoints_plus1", _p32(base, EV0 + 16, 11), "sparse"),
        ("label_ge_numclass", _pbyte(base, EV0 + 20 + 80 + 40, 250),
         "dense"),
        ("coord_negative", _p32(base, EV0 + 20, 0xFFFFFFFF), "sparse"),
        ("coord_ge_shape", _p32(base, EV0 + 20, 70), "sparse"),
        ("extent_ge_int16",
         _p32(_p32(base, EV0 + 8, 40000), EV0 + 12, 40000), "sparse"),
        # v2 framing over a v1 payload: the LAST event's has_weights byte
        # lands past EOF
        ("v2_framing_v1_payload", _p32(base, 4, 2), "dense"),
    ]
    return cases


_CASES = None


def _cases(tmp_path_factory):
    global _CASES
    if _CASES is None:
        base = _base_bytes(tmp_path_factory.mktemp("fuzzbase"))
        _CASES = _corpus(base)
        assert len(_CASES) >= 50, len(_CASES)
    return _CASES


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return _cases(tmp_path_factory)


def _dcfg(path: str, mode: str) -> DataConfig:
    # image_size == the plane extent: the crop window covers every point,
    # so semantic corruptions (e.g. a bad label) cannot hide outside it
    return DataConfig(image_size=64, batch_size=2, planes=(0,),
                      input_files=(path,), synthetic=False,
                      random_access=False, max_points=64,
                      transfer="sparse" if mode == "sparse" else "dense")


def test_numpy_reader_rejects_every_corruption(corpus, tmp_path):
    """(a) numpy: read_events (structural) + pipeline validators (semantic)
    + BatchLoader constructor (dimensionality) reject all >= 50 cases."""
    rejected = 0
    for name, data, mode in corpus:
        path = str(tmp_path / f"{name}.usef")
        with open(path, "wb") as f:
            f.write(data)
        try:
            events = ev.read_events(path)
            # structurally readable -> the semantic validators must trip
            # (the same split as the C++ decoder: read_event vs fill)
            if mode == "loader":
                BatchLoader(_dcfg(path, mode), num_class=3, train=False)
            elif mode == "sparse":
                sparse_batch(events, planes=(0,), max_points=64, ndims=2)
            else:
                densify_batch(events, image_size=64, planes=(0,),
                              weight_mode="class_balance", num_class=3)
        except (ValueError, struct.error):
            rejected += 1
        else:
            pytest.fail(f"corruption {name!r} was silently ACCEPTED by the "
                        f"numpy path")
    assert rejected == len(corpus) >= 50


@pytest.mark.skipif(not cxx_decoder.available(),
                    reason="liburesnet_decoder.so not built — run "
                           "`make -C cxx/decoder` (the C++ fuzz leg also "
                           "runs inside `make test/tsan/asan`)")
def test_cxx_decoder_rejects_every_corruption(corpus, tmp_path):
    """(b) C++ decoder: urd_open returns an error, or the first urd_next
    returns -1 (surfaced as RuntimeError) — for all >= 50 cases; the
    sanitizer legs of the same sweep live in selftest.cpp."""
    from uresnet_tpu.data.cxx_decoder import CxxBatchLoader

    rejected = 0
    for name, data, mode in corpus:
        path = str(tmp_path / f"{name}.usef")
        with open(path, "wb") as f:
            f.write(data)
        loader = None
        try:
            loader = CxxBatchLoader(_dcfg(path, mode), num_class=3,
                                    train=False)
            loader.start(2)
            loader.next()
        except (RuntimeError, ValueError):
            rejected += 1
        else:
            pytest.fail(f"corruption {name!r} was silently ACCEPTED by the "
                        f"C++ decoder")
        finally:
            if loader is not None:
                loader.stop()
                loader.close()
    assert rejected == len(corpus) >= 50


def test_valid_base_file_is_accepted(tmp_path):
    """The sweep's base file itself parses and densifies cleanly through
    both paths — the corpus measures corruption rejection, not a reader
    that rejects everything."""
    base = _base_bytes(tmp_path)
    path = str(tmp_path / "ok.usef")
    with open(path, "wb") as f:
        f.write(base)
    events = ev.read_events(path)
    assert len(events) == 2
    out = densify_batch(events, image_size=64, planes=(0,),
                        weight_mode="class_balance", num_class=3)
    assert out["data"].shape == (2, 64, 64, 1)
    sp = sparse_batch(events, planes=(0,), max_points=64, ndims=2)
    assert sp["npoints"].tolist() == [10, 11]
    if cxx_decoder.available():
        from uresnet_tpu.data.cxx_decoder import CxxBatchLoader

        loader = CxxBatchLoader(_dcfg(path, "dense"), num_class=3,
                                train=False)
        b = loader.next()
        np.testing.assert_allclose(b["data"][..., 0], out["data"][..., 0])
        loader.stop()
        loader.close()
