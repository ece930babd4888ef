"""Serving-artifact export (engine/export.py, tools/export_serving.py).

Pins: the deserialized artifact computes exactly the in-process eval
forward (+softmax), metadata survives the roundtrip, calling-convention
errors surface, and the CLI writes a loadable file from a real checkpoint.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uresnet_tpu.config import Config, ModelConfig
from uresnet_tpu.engine.export import (
    build_serving_fn,
    export_serving,
    load_serving,
    save_serving,
)
from uresnet_tpu.models.uresnet import uresnet_apply, uresnet_init


def tiny_cfg(tmp_path=None, *, dims=2, pack=False):
    cfg = Config()
    cfg.model = ModelConfig(dims=dims, depth=2, base_filters=4,
                            blocks_per_level=2, compute_dtype="float32",
                            pack=pack)
    cfg.data.image_size = 16
    cfg.data.batch_size = 2
    if tmp_path is not None:
        cfg.train.checkpoint_dir = str(tmp_path / "ck")
        cfg.train.log_dir = str(tmp_path / "log")
    return cfg


def trained_ish_tree(cfg, seed=0):
    """Init + noise so BN stats/scales are non-trivial before folding."""
    params, state = uresnet_init(jax.random.PRNGKey(seed), cfg.model)
    rng = np.random.default_rng(seed + 1)
    params = jax.tree.map(
        lambda a: np.asarray(a)
        + 0.05 * rng.standard_normal(a.shape).astype(np.float32), params)
    state = jax.tree.map(
        lambda a: np.abs(np.asarray(a) + 0.1 * rng.standard_normal(a.shape)
                         .astype(np.float32)) + 0.05, state)
    return params, state


@pytest.mark.parametrize("dims", [2, 3])
def test_roundtrip_matches_eval_forward(tmp_path, dims):
    cfg = tiny_cfg(dims=dims)
    cfg.data.image_size = 16 if dims == 2 else 8
    params, state = trained_ish_tree(cfg)
    payload, meta = export_serving(cfg, params, state, platforms=("cpu",))
    path = str(tmp_path / "m.uxm")
    save_serving(path, payload, meta)
    fn, meta2 = load_serving(path)
    assert meta2 == meta

    S = cfg.data.image_size
    shape = (2,) + (S,) * dims + (1,)
    x = np.random.default_rng(3).random(shape).astype(np.float32)

    got = np.asarray(fn(x))
    logits, _ = uresnet_apply(jax.tree.map(jnp.asarray, params),
                              jax.tree.map(jnp.asarray, state),
                              jnp.asarray(x), cfg=cfg.model, train=False)
    want = np.asarray(jax.nn.softmax(logits, axis=-1))
    assert got.shape == tuple(meta["output_shape"])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)


def test_packed_trained_config_exports_canonical(tmp_path):
    """model.pack is a training-layout choice; the exported artifact is the
    canonical forward and must match the canonical eval forward even when
    the config says pack=true."""
    cfg = tiny_cfg(pack=True)
    params, state = trained_ish_tree(cfg, seed=5)
    payload, meta = export_serving(cfg, params, state, platforms=("cpu",),
                                   batch_size=1)
    path = str(tmp_path / "p.uxm")
    save_serving(path, payload, meta)
    fn, _ = load_serving(path)
    x = np.random.default_rng(4).random((1, 16, 16, 1)).astype(np.float32)
    canon = dataclasses_replace_pack_false(cfg)
    logits, _ = uresnet_apply(jax.tree.map(jnp.asarray, params),
                              jax.tree.map(jnp.asarray, state),
                              jnp.asarray(x), cfg=canon.model, train=False)
    want = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(np.asarray(fn(x)), want, rtol=2e-5, atol=2e-5)
    assert meta["model"]["pack"] is True  # provenance preserved in metadata


def dataclasses_replace_pack_false(cfg):
    import dataclasses

    out = Config()
    out.model = dataclasses.replace(cfg.model, pack=False)
    out.data = cfg.data
    return out


def test_wrong_input_shape_raises(tmp_path):
    cfg = tiny_cfg()
    params, state = trained_ish_tree(cfg)
    payload, meta = export_serving(cfg, params, state, platforms=("cpu",))
    path = str(tmp_path / "m.uxm")
    save_serving(path, payload, meta)
    fn, _ = load_serving(path)
    with pytest.raises(Exception):  # jax.export enforces the convention
        fn(np.zeros((2, 8, 8, 1), np.float32))


def test_bad_magic_raises(tmp_path):
    path = tmp_path / "junk.uxm"
    path.write_bytes(b"NOTANART" + b"\0" * 16)
    with pytest.raises(ValueError, match="bad magic"):
        load_serving(str(path))


def test_cli_exports_from_real_checkpoint(tmp_path):
    """End to end: train one step via the Trainer, save, export via the
    tool's main(), selftest inside the tool, then load and call here."""
    import importlib.util
    import os

    from uresnet_tpu.engine.trainer import Trainer
    from uresnet_tpu.parallel.mesh import make_mesh

    cfg = tiny_cfg(tmp_path)
    cfg.data.synthetic_events = 8
    cfg.train.iterations = 1
    cfg.train.summary_iter = 1
    cfg.train.checkpoint_iter = 1
    cfg.train.val_iter = 0
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts, _ = tr.fit(iterations=1, log=False)
    tr.save(ts, 1)

    cfg_path = tmp_path / "cfg.json"
    import dataclasses as dc
    import json

    cfg_path.write_text(json.dumps(
        {"model": dc.asdict(cfg.model),
         "data": {"image_size": 16, "batch_size": 2},
         "train": {"checkpoint_dir": cfg.train.checkpoint_dir,
                   "log_dir": cfg.train.log_dir}}))

    spec = importlib.util.spec_from_file_location(
        "export_serving_tool",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "export_serving.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "model.uxm")
    rc = mod.main(["--config", str(cfg_path), "--output", out,
                   "--platforms", "cpu", "--batch", "2", "--selftest"])
    assert rc == 0
    fn, meta = load_serving(out)
    assert meta["trained_step"] == 1
    x = np.zeros(meta["input_shape"], np.float32)
    scores = np.asarray(fn(x))
    np.testing.assert_allclose(scores.sum(-1), 1.0, rtol=1e-5)
