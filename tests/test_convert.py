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
