"""tools/usef_info.py: dataset inspector statistics must be exact."""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from tools.usef_info import inspect_file, main  # noqa: E402
from uresnet_tpu.data.events import (SparseEvent, SparsePlane,  # noqa: E402
                                     write_events)


def _plane(pid, coords, values, labels, weights=None, shape=(64, 64)):
    return SparsePlane(plane_id=pid, shape=shape,
                       coords=np.asarray(coords, np.int32),
                       values=np.asarray(values, np.float32),
                       labels=np.asarray(labels, np.uint8),
                       weights=(None if weights is None
                                else np.asarray(weights, np.float32)))


def test_inspect_exact_statistics(tmp_path):
    path = str(tmp_path / "a.usef")
    events = [
        SparseEvent(planes=[
            _plane(0, [[1, 2], [3, 4]], [10.0, 20.0], [1, 2]),
            _plane(1, [[5, 6]], [30.0], [0]),
        ]),
        SparseEvent(planes=[
            _plane(0, [[7, 8], [9, 10], [11, 12]], [5.0, 15.0, 25.0],
                   [1, 1, 2]),
        ]),
    ]
    write_events(path, events, ndims=2)
    info = inspect_file(path)
    assert info["version"] == 1 and info["ndims"] == 2
    assert info["num_events"] == 2 == info["events_scanned"]
    assert info["planes"]["0"] == {"events": 2, "points": 5,
                                   "shape": (64, 64)}
    assert info["planes"]["1"] == {"events": 1, "points": 1,
                                   "shape": (64, 64)}
    assert info["max_points_per_plane"] == 3
    assert info["total_points"] == 6
    assert info["label_histogram"] == {"0": 1, "1": 3, "2": 2}
    assert info["value_min"] == 5.0 and info["value_max"] == 30.0
    assert info["value_mean"] == (10 + 20 + 30 + 5 + 15 + 25) / 6
    assert info["has_weights"] is False
    assert info["weight_min"] is None


def test_inspect_v2_weights_and_cap(tmp_path):
    path = str(tmp_path / "w.usef")
    events = [SparseEvent(planes=[
        _plane(0, [[i, i]], [1.0], [1], weights=[0.5 + i])])
        for i in range(5)]
    write_events(path, events, ndims=2)
    info = inspect_file(path)
    assert info["version"] == 2
    assert info["has_weights"] is True
    assert info["weight_min"] == 0.5 and info["weight_max"] == 4.5
    # capped scan: header totals stay exact, stats cover the prefix
    capped = inspect_file(path, max_events=2)
    assert capped["num_events"] == 5 and capped["events_scanned"] == 2
    assert capped["total_points"] == 2
    assert capped["weight_max"] == 1.5


def test_cli_json_and_text(tmp_path, capsys):
    path = str(tmp_path / "c.usef")
    write_events(path, [SparseEvent(planes=[
        _plane(0, [[1, 1]], [2.0], [2])])], ndims=2)
    assert main([path, "--json"]) == 0
    out = capsys.readouterr().out.strip()
    assert json.loads(out)["num_events"] == 1
    assert main([path]) == 0
    text = capsys.readouterr().out
    assert "USEF v1 2D, 1 events" in text
    assert "label histogram" in text


def test_cli_empty_file(tmp_path, capsys):
    path = str(tmp_path / "e.usef")
    write_events(path, [], ndims=2)
    assert main([path]) == 0
    assert "0 events" in capsys.readouterr().out
