"""USEF-scores -> larcv writeback mapping (tools/export_larcv.py), driven
through a fake larcv WRITE interface — the mirror of tests/test_convert.py
(the real larcv/ROOT env is intentionally absent, SURVEY.md §7).

The round-trip gate (VERDICT r4 #2): scores written through the larcv API
and re-read must match the npz export BIT-FOR-BIT at every exported pixel.
"""

import collections

import numpy as np
import pytest

from tools.export_larcv import (dense_scores, export_2d, export_3d,
                                read_metas_2d)
from uresnet_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from uresnet_tpu.data.synthetic import generate_file
from uresnet_tpu.engine.evaluator import run_inference
from uresnet_tpu.engine.trainer import Trainer
from uresnet_tpu.parallel.mesh import make_mesh


# -- fake larcv write API ------------------------------------------------------


class _Img:
    """Written Image2D: exposes the READ-side interface convert_larcv.py
    consumes (.meta(), .as_vector() flat row-major) — writing then reading
    through the same fake closes the format loop."""

    def __init__(self, dense, meta):
        self._d = np.asarray(dense, np.float32).copy()
        self._m = meta

    def meta(self):
        return self._m

    def as_vector(self):
        return self._d.reshape(-1)

    def dense(self):
        return self._d


class FakeImageMeta:
    def __init__(self, w, h, rows, cols, ox, oy, plane):
        self._args = (w, h, rows, cols, ox, oy, plane)

    def rows(self):
        return self._args[2]

    def cols(self):
        return self._args[3]

    def plane(self):
        return self._args[6]


class FakeVoxelSet:
    def __init__(self):
        self.vox = []

    def emplace(self, vid, val, _add):
        self.vox.append((vid, val))


class FakeVoxel3DMeta:
    def __init__(self):
        self.dims = None

    def set(self, xmin, ymin, zmin, xmax, ymax, zmax, nx, ny, nz):
        self.dims = (nx, ny, nz)


class FakeLarcv:
    ImageMeta = FakeImageMeta
    VoxelSet = FakeVoxelSet
    Voxel3DMeta = FakeVoxel3DMeta

    @staticmethod
    def as_image2d_meta(dense, meta):
        return _Img(dense, meta)


class FakeLarcvNoHelper:
    """Exercises the set_pixel fallback (no as_image2d_meta helper)."""

    ImageMeta = FakeImageMeta

    class Image2D:
        def __init__(self, meta):
            self._m = meta
            self._d = np.zeros((meta.rows(), meta.cols()), np.float32)

        def set_pixel(self, r, c, v):
            self._d[r, c] = v

        def meta(self):
            return self._m

        def as_vector(self):
            return self._d.reshape(-1)

        def dense(self):
            return self._d


class _Bucket(list):
    def append_obj(self, o):
        list.append(self, o)

    # image2d containers use .append; sparse3d containers use .set
    def append(self, o):  # noqa: A003
        list.append(self, o)

    def set(self, vs, meta):
        list.append(self, (vs, meta))


class FakeWriteIO:
    """larcv IOManager(kWRITE) stand-in: per-entry producer buckets,
    snapshotted by save_entry()."""

    def __init__(self):
        self._cur = collections.defaultdict(_Bucket)
        self.entries = []   # list of {(kind, producer): [objs]}
        self.ids = []

    def get_data(self, kind, producer):
        return self._cur[(kind, producer)]

    def set_id(self, run, subrun, event):
        self._id = (run, subrun, event)

    def save_entry(self):
        self.entries.append({k: list(v) for k, v in self._cur.items()})
        self.ids.append(self._id)
        self._cur = collections.defaultdict(_Bucket)


# -- fixtures: real tiny inference producing BOTH npz and usef exports --------


@pytest.fixture(scope="module")
def scored_2d(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("exp2d")
    # image_size == detector shape -> crop origin 0, so usef (detector)
    # coords and npz (window) coords coincide and the bit-for-bit
    # comparison is direct
    path = generate_file(str(tmp / "ev.usef"), 4, seed=11, shape=(64, 64),
                         planes=(0, 1))
    cfg = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=64, batch_size=4, planes=(0, 1),
                        input_files=(path,), synthetic=False,
                        random_access=False),
        train=TrainConfig(checkpoint_dir=str(tmp / "ck"),
                          log_dir=str(tmp / "log")),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state()
    npz_path = str(tmp / "scores.npz")
    usef_path = str(tmp / "scores.usef")
    run_inference(trainer, ts, path, npz_path, fmt="npz")
    run_inference(trainer, ts, path, usef_path, fmt="usef")
    return npz_path, usef_path


@pytest.fixture(scope="module")
def scored_3d(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("exp3d")
    path = generate_file(str(tmp / "ev3.usef"), 3, seed=13,
                         shape=(32, 32, 32), planes=(0,))
    cfg = Config(
        model=ModelConfig(dims=3, depth=2, base_filters=2, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=32, batch_size=1, planes=(0,),
                        input_files=(path,), synthetic=False,
                        random_access=False),
        train=TrainConfig(checkpoint_dir=str(tmp / "ck"),
                          log_dir=str(tmp / "log")),
    )
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state()
    npz_path = str(tmp / "scores3.npz")
    usef_path = str(tmp / "scores3.usef")
    run_inference(trainer, ts, path, npz_path, fmt="npz")
    run_inference(trainer, ts, path, usef_path, fmt="usef")
    return npz_path, usef_path


# -- tests ---------------------------------------------------------------------


def _written_images(io, producer):
    """entries -> list of per-entry image lists under a producer."""
    return [e.get(("image2d", producer), []) for e in io.entries]


def test_export_2d_roundtrip_matches_npz_bitforbit(scored_2d):
    """The gate: every npz-exported (event, plane, coord, class) score is
    found bit-identical in the written larcv score images."""
    from uresnet_tpu.data.events import read_events

    npz_path, usef_path = scored_2d
    z = np.load(npz_path)
    events = read_events(usef_path)
    num_class = 3

    io = FakeWriteIO()
    n = export_2d(events, io, FakeLarcv, num_class,
                  score_producer="ssnet_score", pred_producer="ssnet_pred")
    assert len(io.entries) == len(events)
    assert io.ids == [(0, 0, i) for i in range(len(events))]

    # rebuild per-(event, input plane, class) dense images; images are
    # appended in ascending (plane, class) order -> index p_sel*C + c
    planes_present = sorted({pid // num_class
                             for pid in (p.plane_id
                                         for p in events[0].planes)})
    for ei, imgs in enumerate(_written_images(io, "ssnet_score")):
        assert len(imgs) == len(planes_present) * num_class
    preds = _written_images(io, "ssnet_pred")

    n_checked = 0
    for i in range(len(z["event_id"])):
        e = int(z["event_id"][i])
        p = int(z["plane_id"][i])
        r, c = (int(x) for x in z["coords"][i])
        p_idx = planes_present.index(p)
        for cls in range(num_class):
            img = io.entries[e][("image2d", "ssnet_score")][
                p_idx * num_class + cls]
            # BIT-FOR-BIT: same f32, no tolerance
            assert img.dense()[r, c] == z["scores"][i, cls]
        pimg = preds[e][p_idx]
        assert pimg.dense()[r, c] == float(z["pred"][i])
        n_checked += 1
    assert n_checked == len(z["event_id"]) > 0
    assert n == sum(len(e[("image2d", "ssnet_score")])
                    + len(e.get(("image2d", "ssnet_pred"), []))
                    for e in io.entries)


def test_export_2d_set_pixel_fallback_identical(scored_2d):
    """A larcv build without the numpy helper writes the identical images
    through the set_pixel loop."""
    from uresnet_tpu.data.events import read_events

    _, usef_path = scored_2d
    events = read_events(usef_path)
    io_a, io_b = FakeWriteIO(), FakeWriteIO()
    export_2d(events, io_a, FakeLarcv, 3)
    export_2d(events, io_b, FakeLarcvNoHelper, 3)
    for ea, eb in zip(io_a.entries, io_b.entries):
        for a, b in zip(ea[("image2d", "ssnet_score")],
                        eb[("image2d", "ssnet_score")]):
            np.testing.assert_array_equal(a.dense(), b.dense())


def test_export_2d_meta_passthrough(scored_2d):
    """--meta-input metas are attached verbatim to the written images (the
    original detector frame), read through the same fake interface the
    converter tests use."""
    from uresnet_tpu.data.events import read_events

    _, usef_path = scored_2d
    events = read_events(usef_path)

    class _MetaSrcIO:
        def __init__(self, n):
            self._n = n

        def read_entry(self, i):
            self._cur = i

        def get_data(self, kind, producer):
            assert (kind, producer) == ("image2d", "wire")
            i = self._cur

            class _P:
                def as_vector(self_inner):
                    return [type("M", (), {"meta": lambda s,
                                           _i=i, _p=p: ("meta", _i, _p)})()
                            for p in range(2)]
            return _P()

    metas = read_metas_2d(_MetaSrcIO(len(events)), "wire", len(events), 3)
    io = FakeWriteIO()
    export_2d(events, io, FakeLarcv, 3, metas=metas)
    for ei, entry in enumerate(io.entries):
        for idx, img in enumerate(entry[("image2d", "ssnet_score")]):
            assert img.meta() == ("meta", ei, idx // 3)


def test_export_3d_roundtrip_matches_npz_bitforbit(scored_3d):
    """3D: per-class SparseTensor3D voxel values re-read bit-identical to
    the npz export; voxel ids decode with convert_larcv's x-fastest
    convention."""
    from uresnet_tpu.data.events import read_events

    npz_path, usef_path = scored_3d
    z = np.load(npz_path)
    events = read_events(usef_path)
    num_class = 3
    nx, ny, nz = events[0].planes[0].shape

    io = FakeWriteIO()
    n_vox = export_3d(events, io, FakeLarcv, num_class)
    assert n_vox > 0
    # one sparse3d product per class per entry
    per_class = {}
    for cls in range(num_class):
        key = ("sparse3d", f"ssnet_score_class{cls}")
        per_class[cls] = []
        for e in io.entries:
            (vs, meta), = e[key]
            assert meta.dims == (nx, ny, nz)
            dense = np.zeros((nx, ny, nz), np.float32)
            for vid, val in vs.vox:
                x = vid % nx
                y = (vid // nx) % ny
                zz = vid // (nx * ny)
                dense[x, y, zz] = val
            per_class[cls].append(dense)

    n_checked = 0
    for i in range(len(z["event_id"])):
        e = int(z["event_id"][i])
        x, y, zz = (int(v) for v in z["coords"][i])
        for cls in range(num_class):
            assert per_class[cls][e][x, y, zz] == z["scores"][i, cls]
        n_checked += 1
    assert n_checked == len(z["event_id"]) > 0


def test_dense_scores_last_wins():
    """Colliding coordinates resolve last-wins in file order — the densify
    scatter semantics the npz dedup (_select_export_pixels) mirrors."""
    d = dense_scores((4, 4),
                     np.array([[1, 1], [2, 2], [1, 1]], np.int32),
                     np.array([0.25, 0.5, 0.75], np.float32))
    assert d[1, 1] == np.float32(0.75)
    assert d[2, 2] == np.float32(0.5)
    assert d.sum() == np.float32(0.75) + np.float32(0.5)
