"""On-device dense-ification == numpy host pipeline, bit-level (the sparse
transfer path's exactness gate; BASELINE north_star 'data path moves
on-device')."""

import jax
import numpy as np
import pytest

from uresnet_tpu.config import (Config, DataConfig, ModelConfig, OptimConfig,
                                TrainConfig)
from uresnet_tpu.data.device_pipeline import densify_on_device
from uresnet_tpu.data.pipeline import densify_batch, sparse_batch
from uresnet_tpu.data.synthetic import generate_event


def _events(n=3, shape=(128, 128), planes=(0, 1)):
    rng = np.random.default_rng(7)
    return [generate_event(rng, shape=shape, planes=planes) for _ in range(n)]


@pytest.mark.parametrize("weight_mode,boost", [("class_balance", 1.0),
                                               ("ones", 0.0),
                                               ("nonzero", 2.0)])
def test_device_densify_matches_host(weight_mode, boost):
    events = _events()
    kw = dict(image_size=64, normalize_scale=0.01, normalize_clip=5.0,
              weight_mode=weight_mode, num_class=3, nonzero_boost=boost)
    want = densify_batch(events, planes=(0, 1), **kw)
    sp = sparse_batch(events, planes=(0, 1), max_points=2048)
    got = jax.device_get(densify_on_device(
        sp, image_size=64, num_class=3, normalize_scale=0.01,
        normalize_clip=5.0, weight_mode=weight_mode, nonzero_boost=boost))
    np.testing.assert_array_equal(got["label"], want["label"])
    np.testing.assert_allclose(got["data"], want["data"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got["weight"], want["weight"], rtol=1e-5,
                               atol=1e-6)


def test_device_densify_empty_event():
    sp = {
        "coords": np.zeros((1, 8, 2), np.int32),
        "values": np.zeros((1, 8), np.float32),
        "labels": np.zeros((1, 8), np.int32),
        "npoints": np.zeros((1,), np.int32),
        "shape": np.full((1, 2), 128, np.int32),
    }
    out = jax.device_get(densify_on_device(sp, image_size=32))
    assert out["data"].sum() == 0
    assert np.isfinite(out["weight"]).all()


def test_sparse_transfer_train_step(tmp_path):
    """End-to-end: sparse loader batches through the jitted train step."""
    from uresnet_tpu.engine.trainer import Trainer
    from uresnet_tpu.parallel.mesh import make_mesh

    cfg = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=32, batch_size=4, planes=(0,),
                        synthetic=True, synthetic_events=8, seed=5,
                        num_threads=1, random_access=False,
                        transfer="sparse", max_points=1024,
                        backend="python"),
        optim=OptimConfig(lr=1e-3),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "c"),
                          log_dir=str(tmp_path / "l")),
    )
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts = tr.init_state()
    loader = tr.make_loader(train=True)
    batch = loader.next()
    assert "coords" in batch
    batch.pop("cursor")
    ts, m = tr.train_step(ts, tr._device_batch(batch))
    assert np.isfinite(float(m["loss"]))

    # eval path handles sparse batches too
    m_e = tr.eval_step(ts, tr._device_batch(
        {k: v for k, v in loader._make_batch().items() if k != "cursor"}))
    assert np.isfinite(float(m_e["loss"]))


def test_dense_vs_sparse_same_loss(tmp_path):
    """Same events through dense-host and sparse-device paths -> same loss."""
    from uresnet_tpu.engine.trainer import Trainer
    from uresnet_tpu.parallel.mesh import make_mesh

    events = _events(n=4, shape=(128, 128), planes=(0,))
    dense = densify_batch(events, image_size=32, planes=(0,),
                          weight_mode="class_balance", num_class=3)
    sp = sparse_batch(events, planes=(0,), max_points=2048)

    cfg = Config(
        model=ModelConfig(depth=2, base_filters=4, num_class=3,
                          compute_dtype="float32"),
        data=DataConfig(image_size=32, batch_size=4, planes=(0,)),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "c"),
                          log_dir=str(tmp_path / "l")),
    )
    tr = Trainer(cfg, mesh=make_mesh(1))
    ts = tr.init_state()
    m_dense = tr.eval_step(ts, tr._device_batch(dense))
    ts2 = tr.init_state()
    m_sparse = tr.eval_step(ts2, tr._device_batch(sp))
    assert abs(float(m_dense["loss"]) - float(m_sparse["loss"])) < 1e-5
    assert abs(float(m_dense["miou"]) - float(m_sparse["miou"])) < 1e-5