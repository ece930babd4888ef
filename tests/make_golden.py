"""Regenerate golden fixtures (run from repo root on the CPU backend):

    JAX_PLATFORMS=cpu python tests/make_golden.py

Fixtures pin the numerics of the fixed-seed tiny net (SURVEY.md §4); only
regenerate when an *intentional* numerics change lands, and say so in the
commit message.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins the TPU otherwise
import jax.numpy as jnp
import numpy as np

from uresnet_tpu.config import ModelConfig
from uresnet_tpu.models.uresnet import uresnet_apply, uresnet_init


def main():
    cfg = ModelConfig(depth=2, base_filters=4, num_class=3,
                      compute_dtype="float32")
    params, state = uresnet_init(jax.random.PRNGKey(7), cfg)
    x = jnp.linspace(0, 1, 16 * 16).reshape(1, 16, 16, 1).astype(jnp.float32)
    logits, _ = uresnet_apply(params, state, x, cfg=cfg, train=False)
    os.makedirs("tests/fixtures", exist_ok=True)
    np.savez(
        "tests/fixtures/golden_tiny2d.npz",
        sum=np.asarray(jnp.sum(logits)),
        abssum=np.asarray(jnp.sum(jnp.abs(logits))),
        probe=np.asarray(logits[0, ::5, ::5, :]),
    )
    print("wrote tests/fixtures/golden_tiny2d.npz",
          float(jnp.sum(logits)), float(jnp.sum(jnp.abs(logits))))


if __name__ == "__main__":
    main()
