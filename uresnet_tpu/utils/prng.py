"""Explicit PRNG utilities.

The reference relies on TF1 global graph seeds; the rebuild makes randomness
explicit (SURVEY.md §7 design stance): every stochastic component takes a
`jax.random` key, and checkpointing persists the trainer key so resume is
bitwise-deterministic (SURVEY.md §5 checkpoint/resume contract).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import jax


def key_seq(seed: int) -> Iterator[jax.Array]:
    """Infinite stream of fresh keys derived from one seed."""
    key = jax.random.PRNGKey(seed)
    while True:
        key, sub = jax.random.split(key)
        yield sub


def split_like(key: jax.Array, names: Sequence[str]) -> dict:
    """Split a key into a dict of named subkeys (stable w.r.t. name order)."""
    keys = jax.random.split(key, len(names))
    return {n: k for n, k in zip(sorted(names), keys)}
