import jax.numpy as jnp
import numpy as np

from uresnet_tpu.engine.losses import weighted_softmax_xent
from uresnet_tpu.engine.metrics import segmentation_metrics


def test_weighted_xent_matches_numpy(rng):
    logits = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    labels = rng.integers(0, 3, (2, 4, 4))
    weights = rng.uniform(0.1, 2.0, (2, 4, 4)).astype(np.float32)
    got = float(weighted_softmax_xent(jnp.asarray(logits), jnp.asarray(labels),
                                      jnp.asarray(weights)))
    # numpy oracle
    z = logits - logits.max(-1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(-1, keepdims=True))
    xent = -np.take_along_axis(logp, labels[..., None], -1)[..., 0]
    want = float((weights * xent).mean())
    assert abs(got - want) < 1e-5

    got2 = float(weighted_softmax_xent(jnp.asarray(logits), jnp.asarray(labels),
                                       jnp.asarray(weights),
                                       normalize="weight_sum"))
    want2 = float((weights * xent).sum() / weights.sum())
    assert abs(got2 - want2) < 1e-5


def test_metrics_handbuilt():
    # 1x2x2 image, 3 classes. logits argmax = [[0,1],[2,2]]
    logits = jnp.asarray([[[[5., 0, 0], [0, 5, 0]],
                           [[0, 0, 5], [0, 0, 5]]]])
    labels = jnp.asarray([[[0, 1], [2, 1]]])
    data = jnp.asarray([[[[0.], [1.]], [[1.], [0.]]]])  # nonzero at (0,1),(1,0)
    m = segmentation_metrics(logits, labels, data, num_class=3)
    assert abs(float(m["acc_all"]) - 3 / 4) < 1e-6
    # nonzero pixels: (0,1) correct (1==1), (1,0) correct (2==2) -> 1.0
    assert abs(float(m["acc_nonzero"]) - 1.0) < 1e-6
    # IoU: class0 1/1; class1 1/2; class2 1/2 -> miou = 2/3
    assert abs(float(m["miou"]) - (1 + 0.5 + 0.5) / 3) < 1e-6


def test_metrics_all_empty_nonzero_guard():
    logits = jnp.zeros((1, 2, 2, 3))
    labels = jnp.zeros((1, 2, 2), jnp.int32)
    data = jnp.zeros((1, 2, 2, 1))
    m = segmentation_metrics(logits, labels, data, num_class=3)
    assert np.isfinite(float(m["acc_nonzero"]))


def test_segmentation_counts_per_row_exact():
    """segmentation_counts returns PER-ROW f32 sums (each row < 2^24
    pixels -> exact integers) and reduce_counts folds them in float64, so
    dataset confusion totals stay exact at any scale (round-3 review:
    a single f32 accumulator saturates at 16.7M pixels)."""
    import jax
    import numpy as np

    from uresnet_tpu.engine.metrics import (metrics_from_counts,
                                            reduce_counts,
                                            segmentation_counts,
                                            segmentation_metrics)

    rng = np.random.default_rng(9)
    B, S, C = 4, 16, 3
    logits = rng.standard_normal((B, S, S, C)).astype(np.float32)
    labels = rng.integers(0, C, (B, S, S)).astype(np.int32)
    data = (rng.random((B, S, S, 1)) > 0.7).astype(np.float32)

    counts = jax.device_get(segmentation_counts(
        logits, labels, data, num_class=C))
    assert counts["conf"].shape == (B, C, C)
    assert counts["correct_nonzero"].shape == (B,)
    r = reduce_counts(counts)
    assert r["conf"].shape == (C, C) and r["conf"].dtype == np.float64
    assert r["conf"].sum() == B * S * S          # every pixel counted once
    m = metrics_from_counts(r)
    want = jax.device_get(segmentation_metrics(
        logits, labels, data, num_class=C))
    for k in ("acc_all", "acc_nonzero", "miou"):
        assert abs(m[k] - float(want[k])) < 1e-6, k

    # row masking: zeroing the last row removes exactly its pixels
    rv = np.array([1, 1, 1, 0], np.float32)
    r2 = reduce_counts(jax.device_get(segmentation_counts(
        logits, labels, data, num_class=C, row_valid=rv)))
    assert r2["conf"].sum() == 3 * S * S
    assert r2["n_pixels"] == 3 * S * S
