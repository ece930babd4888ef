"""Lightweight checkpointer: params + opt state + BN stats + PRNG key +
data cursor, step-tagged dirs, atomic rename.

Capability parity (SURVEY.md §5 checkpoint/resume): the reference uses
`tf.train.Saver` periodic .ckpt with LOAD_FILE/latest restore. Here a
checkpoint is one .npz holding every leaf of the train-state pytree keyed by
its tree path, written to `<dir>/step_<N>.tmp` then atomically renamed to
`<dir>/step_<N>` — a partial write can never be mistaken for a checkpoint.
Resume is bitwise-deterministic given the saved PRNG key and data cursor.

Leaf-path flattening handles dicts, lists/tuples, and NamedTuples (AdamState)
generically via jax.tree_util key-paths, so any future train-state field
serializes without code changes.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_checkpoint(directory: str, step: int, tree: Any,
                    max_to_keep: int = 5) -> str:
    os.makedirs(directory, exist_ok=True)
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for path, leaf in leaves_with_paths:
        arrays[_path_str(path)] = np.asarray(leaf)
    final = os.path.join(directory, f"step_{step:08d}.npz")
    tmp = final + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, final)
    with open(os.path.join(directory, "LATEST.tmp"), "w") as f:
        f.write(os.path.basename(final))
    os.replace(os.path.join(directory, "LATEST.tmp"),
               os.path.join(directory, "LATEST"))
    if max_to_keep and max_to_keep > 0:
        cands = sorted(f for f in os.listdir(directory)
                       if re.fullmatch(r"step_\d+\.npz", f))
        for old in cands[:-max_to_keep]:
            try:
                os.remove(os.path.join(directory, old))
            except OSError:
                pass
    return final


def latest_checkpoint(directory: str) -> Optional[str]:
    marker = os.path.join(directory, "LATEST")
    if os.path.exists(marker):
        with open(marker) as f:
            name = f.read().strip()
        path = os.path.join(directory, name)
        if os.path.exists(path):
            return path
    if not os.path.isdir(directory):
        return None
    cands = sorted(
        f for f in os.listdir(directory)
        if re.fullmatch(r"step_\d+\.npz", f)
    )
    return os.path.join(directory, cands[-1]) if cands else None


def load_checkpoint(path: str, template: Any, *, partial: bool = False) -> Any:
    """Restore a pytree with the same structure/dtypes/shapes as `template`.

    ``partial=True`` fills leaves absent from the file with the template's
    value instead of raising — the contract of params-only RELEASE
    checkpoints (tools/make_release_ckpt.py strips optimizer moments and
    the PRNG key): params + BN stats load, the optimizer starts fresh.
    Only the `train.load_params_only` restore path uses it; a run's own
    resume checkpoints always load fully."""
    with np.load(path) as z:
        stored = {k: z[k] for k in z.files}
    # release artifacts store bf16 kernels as uint16 bit patterns (npz has
    # no bfloat16); the manifest lists which keys to re-view
    bf16_keys = set()
    if "__kernels_bf16__" in stored:
        bf16_keys = {str(k) for k in stored.pop("__kernels_bf16__")}
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path_, leaf in leaves_with_paths:
        key = _path_str(path_)
        if key not in stored:
            if partial:
                new_leaves.append(np.asarray(leaf))
                continue
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = stored[key]
        if key in bf16_keys:
            import ml_dtypes

            arr = arr.view(ml_dtypes.bfloat16)
        tleaf = np.asarray(leaf)
        if arr.shape != tleaf.shape:
            raise ValueError(
                f"leaf {key!r}: checkpoint shape {arr.shape} != template {tleaf.shape}")
        new_leaves.append(arr.astype(tleaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def checkpoint_step(path: str) -> int:
    m = re.search(r"step_(\d+)\.npz$", path)
    if not m:
        raise ValueError(f"not a checkpoint path: {path}")
    return int(m.group(1))
