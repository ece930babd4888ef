"""Params-only RELEASE checkpoints (tools/make_release_ckpt.py): stripped
artifacts restore through the fine-tune path and reproduce the full
checkpoint's eval BIT-EXACTLY — the mechanism that makes the flagship
quality headlines reproducible from committed artifacts (VERDICT r4 #3)."""

import dataclasses

import numpy as np
import pytest

from tools.make_release_ckpt import main as release_main
from tools.make_release_ckpt import strip
from uresnet_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from uresnet_tpu.data.synthetic import generate_file
from uresnet_tpu.engine.evaluator import evaluate_dataset
from uresnet_tpu.engine.trainer import Trainer
from uresnet_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A tiny bf16 model trained a few steps + its full checkpoint + a
    held-out file."""
    tmp = tmp_path_factory.mktemp("rel")
    eval_path = generate_file(str(tmp / "ev.usef"), 4, seed=9,
                              shape=(64, 64), planes=(0,))
    cfg = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="bfloat16", pack=True),
        data=DataConfig(image_size=64, batch_size=2, planes=(0,),
                        synthetic=True, synthetic_events=8),
        train=TrainConfig(seed=3, checkpoint_dir=str(tmp / "ck"),
                          log_dir=str(tmp / "log"), iterations=3,
                          summary_iter=3, checkpoint_iter=3, val_iter=0),
    )
    tr = Trainer(cfg, mesh=make_mesh(1))
    tr.fit(log=False)
    from uresnet_tpu.engine.checkpoint import latest_checkpoint

    full = latest_checkpoint(cfg.train.checkpoint_dir)
    assert full
    return cfg, full, eval_path, tmp


def _eval_cfg(cfg, eval_path, load_file=None):
    data = dataclasses.replace(cfg.data, input_files=(eval_path,),
                               synthetic=False, random_access=False)
    train = cfg.train
    if load_file:
        train = dataclasses.replace(train, load_file=load_file,
                                    load_params_only=True)
    return dataclasses.replace(cfg, data=data, train=train)


def test_release_artifact_eval_is_bit_exact(trained):
    """bf16-kernel release artifact == full checkpoint: identical logits
    path => identical integer confusion counts and metrics."""
    cfg, full, eval_path, tmp = trained
    out = str(tmp / "release.npz")
    keys, in_b, out_b, sha = strip(full, out, kernels_dtype="bfloat16")
    assert out_b < in_b  # moments + PRNG gone (compression varies)
    assert all(k in ("meta/step", "__kernels_bf16__")
               or k.startswith("train_state/") for k in keys)
    assert len(sha) == 64

    tr_full = Trainer(_eval_cfg(cfg, eval_path), mesh=make_mesh(1))
    ts_full, step, _ = tr_full.restore(full)
    assert step == 3
    m_full = evaluate_dataset(tr_full, ts_full)

    tr_rel = Trainer(_eval_cfg(cfg, eval_path, load_file=out),
                     mesh=make_mesh(1))
    ts_rel, step_rel, _ = tr_rel.restore()
    assert step_rel == 0  # fine-tune restore: fresh optimizer at step 0
    m_rel = evaluate_dataset(tr_rel, ts_rel)

    # bit-exact: the confusion counts are integers; every derived metric
    # must match exactly (bf16(bf16(w)) == bf16(w) through ops/conv.py)
    assert m_full == m_rel


def test_release_artifact_refuses_full_resume(trained):
    """Without load_params_only the stripped artifact must fail LOUDLY
    (missing optimizer leaves), not resume training with garbage."""
    cfg, full, eval_path, tmp = trained
    out = str(tmp / "release2.npz")
    strip(full, out, kernels_dtype="keep")
    tr = Trainer(_eval_cfg(cfg, eval_path), mesh=make_mesh(1))
    with pytest.raises(KeyError, match="missing leaf"):
        tr.restore(out)


def test_release_cli_gates_bf16_cast(trained, capsys):
    """The CLI refuses the bf16 kernel cast without --force (it is only
    bit-exact for bf16-compute models)."""
    cfg, full, eval_path, tmp = trained
    out = str(tmp / "release3.npz")
    assert release_main([full, out, "--kernels-dtype", "bfloat16"]) == 2
    assert release_main([full, out, "--kernels-dtype", "bfloat16",
                         "--force"]) == 0
    assert "sha256=" in capsys.readouterr().out


def test_release_keep_dtype_exact_for_f32_models(tmp_path):
    """kernels-dtype=keep artifacts are exact for ANY compute dtype: the
    restored params are byte-identical to the saved ones."""
    cfg = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=32, batch_size=2, planes=(0,),
                        synthetic=True, synthetic_events=4),
        train=TrainConfig(seed=1, checkpoint_dir=str(tmp_path / "ck"),
                          log_dir=str(tmp_path / "log"), iterations=2,
                          summary_iter=2, checkpoint_iter=2, val_iter=0),
    )
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts, _ = tr.fit(log=False)
    from uresnet_tpu.engine.checkpoint import latest_checkpoint

    full = latest_checkpoint(cfg.train.checkpoint_dir)
    out = str(tmp_path / "rel.npz")
    strip(full, out, kernels_dtype="keep")
    cfg2 = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, load_file=out, load_params_only=True))
    tr2 = Trainer(cfg2, mesh=make_mesh(1))
    ts2, _, _ = tr2.restore()
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(ts.params),
                    jax.tree_util.tree_leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
