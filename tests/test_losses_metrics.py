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
