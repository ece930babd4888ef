"""Every shipped config must stay constructible.

Round-1 drift lesson: configs/train_multiplane.yaml shipped with a
(batch_size, planes) geometry the loaders later learned to reject, and
configs/train_3d_192.yaml shipped a batch that OOMs the target chip — no
test loaded the files, so nothing caught it. This suite parses every file
under configs/ and asserts the same invariants the runtime enforces at
construction time (data/loader.py check_batch_geometry, the Trainer's
batch/mesh divisibility rule), without paying for full-size model builds.
"""

import glob
import os

import pytest

from uresnet_tpu.config import load_config, parse_kv_text
from uresnet_tpu.data.loader import check_batch_geometry

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")
YAMLS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))


@pytest.mark.parametrize("path", YAMLS, ids=[os.path.basename(p) for p in YAMLS])
def test_shipped_config_constructible(path):
    cfg = load_config(path)
    # data geometry: what BatchLoader/CxxBatchLoader enforce
    rows = check_batch_geometry(cfg.data.batch_size, max(len(cfg.data.planes), 1))
    assert rows == cfg.data.batch_size
    # mesh divisibility: what Trainer.__init__ enforces
    n_data = max(cfg.parallel.data, 1)
    assert cfg.data.batch_size % n_data == 0, (
        f"{path}: batch_size {cfg.data.batch_size} not divisible by "
        f"parallel.data {n_data}")
    # model knobs sane for the declared dims
    assert cfg.model.dims in (2, 3)
    assert cfg.data.image_size % (2 ** cfg.model.depth) == 0, (
        f"{path}: image_size must be divisible by 2^depth for the U-Net "
        f"down/up path")
    # parallelism composition rules Trainer.__init__ enforces
    if cfg.parallel.model > 1:
        assert not cfg.model.pack, (
            f"{path}: parallel.model > 1 requires the canonical layout "
            f"(model.pack: false)")
        assert max(cfg.parallel.spatial, 1) == 1, (
            f"{path}: parallel.spatial and parallel.model cannot be "
            f"combined (XLA partitioner miscompile, tests/test_tp.py)")
        assert cfg.data.batch_size % max(cfg.parallel.data, 1) == 0


def test_reference_style_cfg_parses():
    path = os.path.join(CONFIG_DIR, "reference_style.cfg")
    with open(path) as f:
        cfg = parse_kv_text(f.read())
    check_batch_geometry(cfg.data.batch_size, max(len(cfg.data.planes), 1))


def test_check_batch_geometry_rejects():
    with pytest.raises(ValueError):
        check_batch_geometry(32, 3)          # not a whole number of events
    with pytest.raises(ValueError):
        check_batch_geometry(0, 1)
    with pytest.raises(ValueError):
        check_batch_geometry(9, 9)           # >8 planes
    with pytest.raises(ValueError):
        check_batch_geometry(6, 3, shard_count=4)  # 2 events over 4 hosts
    assert check_batch_geometry(6, 3, shard_count=2) == 3
