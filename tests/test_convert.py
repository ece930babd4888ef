"""larcv->USEF converter mapping, driven through a fake larcv interface
(the real larcv/ROOT env is intentionally absent — SURVEY.md §7)."""

import sys

import numpy as np

sys.path.insert(0, ".")

from tools.convert_larcv import convert  # noqa: E402


class _Meta:
    def __init__(self, r, c):
        self._r, self._c = r, c

    def rows(self):
        return self._r

    def cols(self):
        return self._c


class _Img:
    def __init__(self, dense):
        self._d = dense

    def meta(self):
        return _Meta(*self._d.shape)

    def as_vector(self):
        return self._d.reshape(-1)


class _Product:
    def __init__(self, imgs):
        self._imgs = imgs

    def as_vector(self):
        return self._imgs


class FakeIO:
    def __init__(self, events):
        # events: list of dict producer -> [dense arrays per plane]
        self._events = events
        self._cur = 0

    def get_n_entries(self):
        return len(self._events)

    def read_entry(self, i):
        self._cur = i

    def get_data(self, kind, producer):
        return _Product([_Img(d) for d in self._events[self._cur][producer]])


def test_convert_mapping():
    rng = np.random.default_rng(0)
    d0 = np.zeros((8, 8), np.float32)
    d0[2, 3] = 5.0
    d0[7, 1] = 2.5
    l0 = np.zeros((8, 8), np.float32)
    l0[2, 3] = 1
    l0[7, 1] = 2
    d1 = np.zeros((8, 8), np.float32)
    d1[0, 0] = 1.0
    l1 = np.zeros((8, 8), np.float32)
    l1[0, 0] = 1
    io = FakeIO([{"wire": [d0, d1], "segment": [l0, l1]}])
    events = convert(io, "wire", "segment", set(), [])
    assert len(events) == 1
    ev = events[0]
    assert len(ev.planes) == 2
    p0 = ev.planes[0]
    assert p0.shape == (8, 8)
    assert len(p0.values) == 2
    got = {tuple(c): (v, l) for c, v, l in zip(p0.coords, p0.values, p0.labels)}
    assert got[(2, 3)] == (5.0, 1)
    assert got[(7, 1)] == (2.5, 2)
    p1 = ev.planes[1]
    assert len(p1.values) == 1 and p1.labels[0] == 1


def test_convert_plane_filter():
    d = np.ones((4, 4), np.float32)
    l = np.ones((4, 4), np.float32)
    io = FakeIO([{"wire": [d, d, d], "segment": [l, l, l]}])
    events = convert(io, "wire", "segment", {2}, [])
    assert len(events[0].planes) == 1
    assert events[0].planes[0].plane_id == 2


class _Voxel:
    def __init__(self, vid, val):
        self._id, self._v = vid, val

    def id(self):
        return self._id

    def value(self):
        return self._v


class _Meta3D:
    def __init__(self, nx, ny, nz):
        self._n = (nx, ny, nz)

    def num_voxel_x(self):
        return self._n[0]

    def num_voxel_y(self):
        return self._n[1]

    def num_voxel_z(self):
        return self._n[2]


class _Sparse3D:
    def __init__(self, voxels, meta):
        self._v, self._m = voxels, meta

    def as_vector(self):
        return self._v

    def meta(self):
        return self._m


class FakeIO3D:
    def __init__(self, events):
        # events: list of dict producer -> _Sparse3D
        self._events = events
        self._cur = 0

    def get_n_entries(self):
        return len(self._events)

    def read_entry(self, i):
        self._cur = i

    def get_data(self, kind, producer):
        assert kind == "sparse3d"
        return self._events[self._cur][producer]


def test_convert_empty_plane_kept():
    """Planes with zero charge pixels become zero-point USEF planes (the
    crop pipeline centers on the image middle; nothing crashes)."""
    d0 = np.zeros((8, 8), np.float32)
    l0 = np.zeros((8, 8), np.float32)
    d1 = np.zeros((8, 8), np.float32)
    d1[3, 3] = 1.0
    l1 = np.zeros((8, 8), np.float32)
    l1[3, 3] = 2
    io = FakeIO([{"wire": [d0, d1], "segment": [l0, l1]}])
    events = convert(io, "wire", "segment", set(), [])
    assert len(events[0].planes) == 2
    assert len(events[0].planes[0].values) == 0    # empty plane survives
    assert len(events[0].planes[1].values) == 1


def test_convert_roundtrip_trains(tmp_path):
    """Byte-accurate end-to-end: fake larcv -> convert -> USEF write ->
    read back identical -> the real BatchLoader densifies it (the parity
    protocol in PARITY.md minus the real ROOT file)."""
    from uresnet_tpu.config import DataConfig
    from uresnet_tpu.data.events import read_events, write_events
    from uresnet_tpu.data.loader import BatchLoader

    rng = np.random.default_rng(7)
    evs = []
    for _ in range(4):
        planes = {}
        for prod in ("wire", "segment"):
            planes[prod] = []
        for p in range(3):
            d = np.zeros((64, 48), np.float32)
            n = rng.integers(5, 30)
            r = rng.integers(0, 64, n)
            c = rng.integers(0, 48, n)
            d[r, c] = rng.random(n).astype(np.float32) * 80 + 1
            l = np.zeros((64, 48), np.float32)
            l[r, c] = rng.integers(1, 3, n)
            planes["wire"].append(d)
            planes["segment"].append(l)
        evs.append(planes)
    io = FakeIO(evs)
    events = convert(io, "wire", "segment", set(), [])
    path = str(tmp_path / "conv.usef")
    write_events(path, events, ndims=2)

    back = read_events(path)
    assert len(back) == 4
    for a, b in zip(events, back):
        for pa, pb in zip(a.planes, b.planes):
            assert pa.plane_id == pb.plane_id
            assert tuple(pa.shape) == tuple(pb.shape)
            np.testing.assert_array_equal(pa.coords, pb.coords)
            np.testing.assert_array_equal(pa.values, pb.values)
            np.testing.assert_array_equal(pa.labels, pb.labels)

    cfg = DataConfig(image_size=32, batch_size=3, planes=(0, 1, 2),
                     input_files=(path,), synthetic=False,
                     random_access=False, transfer="dense")
    b = BatchLoader(cfg, num_class=3).next()
    assert b["data"].shape == (3, 32, 32, 1)
    assert (b["data"] >= 0).all() and np.isfinite(b["data"]).all()
    assert set(np.unique(b["label"])) <= {0, 1, 2}


def test_convert_3d_voxels(tmp_path):
    """3D SparseTensor mapping: voxel ids decode x-fastest; labels joined
    by voxel id with missing labels -> 0; USEF 3D roundtrip."""
    from tools.convert_larcv import convert_3d
    from uresnet_tpu.data.events import read_events, write_events

    nx, ny, nz = 8, 6, 4

    def vid(x, y, z):
        return x + nx * (y + ny * z)

    data_vox = [_Voxel(vid(1, 2, 3), 5.0), _Voxel(vid(7, 0, 0), 2.0),
                _Voxel(vid(3, 5, 1), 9.0)]
    lab_vox = [_Voxel(vid(1, 2, 3), 1.0), _Voxel(vid(3, 5, 1), 2.0)]
    meta = _Meta3D(nx, ny, nz)
    io = FakeIO3D([{"wire": _Sparse3D(data_vox, meta),
                    "segment": _Sparse3D(lab_vox, meta)}])
    events = convert_3d(io, "wire", "segment", [])
    assert len(events) == 1
    pl = events[0].planes[0]
    assert tuple(pl.shape) == (nx, ny, nz)
    got = {tuple(c): (v, l)
           for c, v, l in zip(pl.coords, pl.values, pl.labels)}
    assert got[(1, 2, 3)] == (5.0, 1)
    assert got[(7, 0, 0)] == (2.0, 0)   # unlabeled voxel -> background
    assert got[(3, 5, 1)] == (9.0, 2)

    path = str(tmp_path / "c3.usef")
    write_events(path, events, ndims=3)
    back = read_events(path)
    np.testing.assert_array_equal(back[0].planes[0].coords, pl.coords)
    np.testing.assert_array_equal(back[0].planes[0].values, pl.values)
    np.testing.assert_array_equal(back[0].planes[0].labels, pl.labels)


def test_convert_weight_producer(tmp_path):
    """--weight-producer: weight images sampled at the charge coords land
    as USEF v2 per-point weights, round-trip intact, and feed
    weight_mode='file' (SURVEY.md §2.1 data/label/weight)."""
    from tools.convert_larcv import convert
    from uresnet_tpu.config import DataConfig
    from uresnet_tpu.data.events import read_events, read_header, write_events
    from uresnet_tpu.data.loader import BatchLoader

    d = np.zeros((16, 16), np.float32)
    d[3, 4] = 5.0
    d[9, 9] = 2.0
    l = np.zeros((16, 16), np.float32)
    l[3, 4] = 1
    l[9, 9] = 2
    w = np.ones((16, 16), np.float32)
    w[3, 4] = 7.5
    w[9, 9] = 0.25
    io = FakeIO([{"wire": [d], "segment": [l], "weight": [w]}])
    events = convert(io, "wire", "segment", set(), [],
                     weight_producer="weight")
    pl = events[0].planes[0]
    got = {tuple(c): wv for c, wv in zip(pl.coords, pl.weights)}
    assert got[(3, 4)] == 7.5 and got[(9, 9)] == 0.25

    path = str(tmp_path / "w.usef")
    write_events(path, events, ndims=2)
    assert read_header(path)[0] == 2
    back = read_events(path)
    np.testing.assert_array_equal(back[0].planes[0].weights, pl.weights)

    cfg = DataConfig(image_size=16, batch_size=1, planes=(0,),
                     input_files=(path,), synthetic=False,
                     random_access=False, transfer="dense",
                     weight_mode="file")
    b = BatchLoader(cfg, num_class=3).next()
    assert b["weight"][0, 3, 4] == 7.5
    assert b["weight"][0, 9, 9] == 0.25
    assert b["weight"].sum() == 16 * 16 - 2 + 7.5 + 0.25


def test_convert_3d_weight_producer():
    from tools.convert_larcv import convert_3d

    nx, ny, nz = 8, 6, 4

    def vid(x, y, z):
        return x + nx * (y + ny * z)

    data_vox = [_Voxel(vid(1, 2, 3), 5.0), _Voxel(vid(7, 0, 0), 2.0)]
    lab_vox = [_Voxel(vid(1, 2, 3), 1.0)]
    w_vox = [_Voxel(vid(1, 2, 3), 3.5)]     # (7,0,0) missing -> 1.0
    meta = _Meta3D(nx, ny, nz)
    io = FakeIO3D([{"wire": _Sparse3D(data_vox, meta),
                    "segment": _Sparse3D(lab_vox, meta),
                    "weight": _Sparse3D(w_vox, meta)}])
    events = convert_3d(io, "wire", "segment", [], weight_producer="weight")
    pl = events[0].planes[0]
    got = {tuple(c): wv for c, wv in zip(pl.coords, pl.weights)}
    assert got[(1, 2, 3)] == 3.5
    assert got[(7, 0, 0)] == 1.0
