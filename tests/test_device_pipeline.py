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

# -- round-2 extensions: augmentation and packed-target layout folded into
# the densify scatter (pure index math on the points).


@pytest.mark.parametrize("dims,shape", [(2, (128, 128)), (3, (48, 48, 48))])
def test_densify_inline_augment_matches_augment_batch(dims, shape):
    """densify(augment_key=k) must equal augment_batch(k, densify(...))
    BIT-FOR-BIT: same key-split/decision sequence, flips/rot applied as
    window-coordinate bijections inside the scatter."""
    from uresnet_tpu.engine.augment import augment_batch

    rng = np.random.default_rng(11)
    events = [generate_event(rng, shape=shape, planes=(0,)) for _ in range(3)]
    sp = sparse_batch(events, planes=(0,), max_points=4096, ndims=dims)
    T = 32
    plain = densify_on_device(sp, image_size=T)
    for seed in (0, 1, 2, 5):
        key = jax.random.PRNGKey(seed)
        want = jax.device_get(augment_batch(key, dict(plain), dims=dims))
        got = jax.device_get(densify_on_device(sp, image_size=T,
                                               augment_key=key))
        np.testing.assert_array_equal(got["label"], want["label"])
        np.testing.assert_array_equal(got["data"], want["data"])
        np.testing.assert_allclose(got["weight"], want["weight"],
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("dims,shape,hpack", [(2, (128, 128), False),
                                              (2, (128, 128), True),
                                              (3, (48, 48, 48), False)])
@pytest.mark.parametrize("weight_mode", ["class_balance", "nonzero"])
def test_densify_packed_targets_match_pack_like_logits(dims, shape, hpack,
                                                       weight_mode):
    """Packed-target scatter == pack_like_logits of the canonical targets
    (bit-exact): same phase-major order the packed head emits."""
    from uresnet_tpu.config import ModelConfig
    from uresnet_tpu.models.packed import loss_layout_phases, pack_like_logits

    mcfg = ModelConfig(dims=dims, base_filters=4, pack=True,
                       pack_extra_h=hpack, compute_dtype="float32")
    ph = loss_layout_phases(mcfg)
    rng = np.random.default_rng(13)
    events = [generate_event(rng, shape=shape, planes=(0,)) for _ in range(2)]
    sp = sparse_batch(events, planes=(0,), max_points=4096, ndims=dims)
    T = 32
    kw = dict(image_size=T, weight_mode=weight_mode)
    want = densify_on_device(sp, **kw)
    got = jax.device_get(densify_on_device(
        sp, **kw, target_phases=ph, target_hpack=(hpack and dims == 2)))
    np.testing.assert_array_equal(got["data"], np.asarray(want["data"]))
    want_lab = jax.device_get(
        pack_like_logits(want["label"][..., None], mcfg))[..., :]
    want_w = jax.device_get(pack_like_logits(want["weight"][..., None], mcfg))
    np.testing.assert_array_equal(got["label"], want_lab.reshape(
        got["label"].shape))
    np.testing.assert_allclose(got["weight"], want_w.reshape(
        got["weight"].shape), rtol=1e-6, atol=1e-7)


def test_sparse_packed_loss_trainer_equivalence(tmp_path):
    """Sparse loader + packed_loss=True (targets scattered packed, augment
    in-scatter) vs packed_loss=False: same loss trajectory."""
    from uresnet_tpu.engine.trainer import Trainer
    from uresnet_tpu.parallel.mesh import make_mesh

    losses = {}
    for packed in (False, True):
        cfg = Config(
            model=ModelConfig(depth=2, base_filters=4, num_class=3,
                              compute_dtype="float32", pack=True,
                              pack_extra_h=True),
            data=DataConfig(image_size=32, batch_size=4, planes=(0,),
                            synthetic=True, synthetic_events=8, seed=5,
                            num_threads=1, random_access=False,
                            transfer="sparse", max_points=1024,
                            backend="python", augment=True),
            optim=OptimConfig(lr=1e-3),
            train=TrainConfig(seed=3, packed_loss=packed,
                              checkpoint_dir=str(tmp_path / f"c{packed}"),
                              log_dir=str(tmp_path / f"l{packed}")),
        )
        tr = Trainer(cfg, mesh=make_mesh(1))
        ts = tr.init_state()
        loader = tr.make_loader(train=True)
        ls = []
        for _ in range(3):
            batch = loader.next()
            batch.pop("cursor")
            ts, m = tr.train_step(ts, tr._device_batch(batch))
            ls.append(float(m["loss"]))
        loader.stop()
        losses[packed] = ls
    np.testing.assert_allclose(losses[False], losses[True], rtol=1e-5)


# -- round-3: file-driven weight product (USEF v2) on device


def _weighted_events(n=3, shape=(128, 128), planes=(0, 1), seed=23):
    rng = np.random.default_rng(seed)
    events = [generate_event(rng, shape=shape, planes=planes)
              for _ in range(n)]
    for evt in events:
        for pl in evt.planes:
            pl.weights = rng.uniform(0.1, 4.0,
                                     len(pl.values)).astype(np.float32)
    return events


def test_device_densify_file_weights_match_host():
    events = _weighted_events()
    kw = dict(image_size=64, normalize_scale=0.01, normalize_clip=5.0,
              weight_mode="file", num_class=3)
    want = densify_batch(events, planes=(0, 1), **kw)
    sp = sparse_batch(events, planes=(0, 1), max_points=2048,
                      with_weights=True)
    got = jax.device_get(densify_on_device(
        sp, image_size=64, num_class=3, normalize_scale=0.01,
        normalize_clip=5.0, weight_mode="file"))
    np.testing.assert_array_equal(got["label"], want["label"])
    np.testing.assert_allclose(got["data"], want["data"], rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_array_equal(got["weight"], want["weight"])


def test_device_densify_file_weights_augment_and_packed():
    """File weights ride the augment bijection and the packed-target
    scatter exactly like label/weight maps do."""
    from uresnet_tpu.config import ModelConfig
    from uresnet_tpu.engine.augment import augment_batch
    from uresnet_tpu.models.packed import loss_layout_phases, pack_like_logits

    events = _weighted_events(planes=(0,))
    sp = sparse_batch(events, planes=(0,), max_points=2048,
                      with_weights=True)
    kw = dict(image_size=32, weight_mode="file")
    # augment: in-scatter == image-space, bit-for-bit
    key = jax.random.PRNGKey(3)
    plain = densify_on_device(sp, **kw)
    want = jax.device_get(augment_batch(key, dict(plain), dims=2))
    got = jax.device_get(densify_on_device(sp, **kw, augment_key=key))
    np.testing.assert_array_equal(got["weight"], want["weight"])
    # packed targets: scatter == pack_like_logits of the canonical map
    mcfg = ModelConfig(dims=2, base_filters=4, pack=True,
                       compute_dtype="float32")
    ph = loss_layout_phases(mcfg)
    gotp = jax.device_get(densify_on_device(sp, **kw, target_phases=ph))
    want_w = jax.device_get(
        pack_like_logits(np.asarray(plain["weight"])[..., None], mcfg))
    np.testing.assert_array_equal(gotp["weight"],
                                  want_w.reshape(gotp["weight"].shape))


def test_device_scatter_duplicate_coords_match_host_last_wins():
    """Colliding points: numpy fancy-assignment is last-wins by contract;
    the device .at[].set(mode='drop') scatter's duplicate order is
    implementation-defined in JAX — this test PINS that it currently
    matches (and the round-3 sparse-export dedupe relies on it). If a JAX
    upgrade changes scatter ordering, this fails loudly instead of the
    export paths silently diverging."""
    from uresnet_tpu.data.events import SparseEvent, SparsePlane

    pl = SparsePlane(
        plane_id=0, shape=(64, 64),
        coords=np.array([[10, 10], [12, 12], [10, 10], [20, 20],
                         [20, 20]], np.int32),
        values=np.array([5.0, 7.0, 9.0, 3.0, 0.0], np.float32),
        labels=np.array([1, 2, 2, 1, 2], np.uint8))
    evt = SparseEvent([pl])
    want = densify_batch([evt], image_size=64, planes=(0,),
                         weight_mode="ones", num_class=3)
    sp = sparse_batch([evt], planes=(0,), max_points=64)
    got = jax.device_get(densify_on_device(sp, image_size=64,
                                           weight_mode="ones"))
    np.testing.assert_array_equal(got["label"], want["label"])
    np.testing.assert_array_equal(got["data"], want["data"])
    # explicit last-wins witnesses
    assert want["data"][0, 10, 10, 0] == np.float32(9.0) * np.float32(0.01)
    assert want["label"][0, 10, 10] == 2
    assert want["data"][0, 20, 20, 0] == 0.0   # zero-value point wins last
    assert want["label"][0, 20, 20] == 2
