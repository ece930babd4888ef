"""tools/ckpt_info.py: checkpoint inspector must report exact totals."""

import json
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, ".")

from tools.ckpt_info import inspect_ckpt, main, resolve  # noqa: E402
from uresnet_tpu.config import (Config, DataConfig, ModelConfig,  # noqa: E402
                                TrainConfig)
from uresnet_tpu.engine.trainer import Trainer  # noqa: E402
from uresnet_tpu.parallel.mesh import make_mesh  # noqa: E402


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckinfo")
    cfg = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=32, batch_size=2, planes=(0,),
                        synthetic=True),
        train=TrainConfig(checkpoint_dir=str(tmp / "ckpt"),
                          log_dir=str(tmp / "log")))
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state()
    trainer.save(ts, step=7, data_cursor=42)
    n_params = sum(int(np.size(x)) for x in jax.tree.leaves(
        jax.device_get(ts.params)))
    return str(tmp / "ckpt"), n_params


def test_inspect_exact_totals(ckpt_dir):
    d, n_params = ckpt_dir
    path = resolve(d)                        # directory -> LATEST
    assert path.endswith("step_00000007.npz")
    info = inspect_ckpt(path)
    assert info["step"] == 7
    assert info["data_cursor"] == 42
    assert info["total_params"] == n_params
    assert info["groups"]["params"]["elements"] == n_params
    # Adam carries two moments per param
    assert info["groups"]["opt"]["elements"] >= 2 * n_params
    # BN sanity block: freshly-initialized running var is exactly 1.0
    assert info["bn"]["var_range"] == [1.0, 1.0]
    assert info["bn"]["var_at_init_frac"] == 1.0
    json.dumps(info)                          # JSON-serializable throughout


def test_resolve_falls_back_without_marker(ckpt_dir, tmp_path):
    import os
    import shutil

    d, _ = ckpt_dir
    alt = tmp_path / "nolatest"
    shutil.copytree(d, alt)
    os.remove(alt / "LATEST")
    assert resolve(str(alt)).endswith("step_00000007.npz")
    with pytest.raises(FileNotFoundError):
        resolve(str(tmp_path))               # empty dir: named error


def test_cli_json_mode(ckpt_dir, capsys):
    d, n_params = ckpt_dir
    assert main([d, "--json"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["total_params"] == n_params
