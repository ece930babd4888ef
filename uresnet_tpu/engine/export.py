"""Serialized serving artifacts: one self-contained compiled-model file.

The reference has no deployment story beyond "keep the TF graph + Saver
checkpoint around" (SURVEY.md §2.1 inference row; serving infrastructure is
a survey non-goal *beyond* the batch inference CLI). For production serving
on TPU this module packages the trained network as a **StableHLO artifact**
via `jax.export`: BN-folded inference forward (models/fold.py) + softmax,
with the weights baked in as constants, serialized together with a JSON
metadata header (architecture, preprocessing constants, class count). The
result is one file that any later JAX runtime can deserialize and call —
no model code, no checkpoint tree, no Python class versioning; XLA
recompiles the embedded StableHLO for whatever platform it lands on
(export targets both `tpu` and `cpu` by default).

File format (`.uxm`): 8-byte magic ``URESNETX`` + u32 little-endian JSON
length + UTF-8 JSON metadata + the `jax.export` payload. The input contract
is the same normalized dense batch `uresnet_apply` takes —
``(B, *spatial, in_channels)`` float32, values already scaled by
``data.normalize_scale``/clipped at ``normalize_clip`` (both recorded in
the metadata so a serving host can reproduce the preprocessing) — and the
output is float32 per-pixel softmax scores ``(B, *spatial, num_class)``,
exactly what the reference's ana step writes back (SURVEY.md §3.2).

Pinned in tests/test_export.py: roundtrip equality against the in-process
eval forward, metadata fidelity, and the input-shape error surface.
"""

from __future__ import annotations

import dataclasses
import json
import struct
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np

from uresnet_tpu.config import Config

_MAGIC = b"URESNETX"
FORMAT_VERSION = 1


def build_serving_fn(cfg: Config, params, state) -> Callable:
    """The function that gets exported: folded-BN forward + softmax.

    Folding first (exact in eval mode, tests/test_fold.py) means the
    artifact contains pure conv(+bias)+ReLU chains — fewer ops to
    serialize and the fused epilogues XLA likes. Packed execution is a
    single-chip *training* layout choice; serving artifacts are canonical
    (the folded apply), so a packed-trained checkpoint exports identically
    (packed training writes canonical-layout checkpoints by invariant)."""
    import jax
    import jax.numpy as jnp

    from uresnet_tpu.models.fold import fold_batchnorm, uresnet_apply_folded

    mcfg = dataclasses.replace(cfg.model, pack=False, remat=False,
                               kernel_backend="xla")
    folded = fold_batchnorm(params, state, mcfg)

    def serve(x):
        logits = uresnet_apply_folded(folded, x, cfg=mcfg)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    return serve


def export_serving(
    cfg: Config,
    params,
    state,
    *,
    batch_size: Optional[int] = None,
    image_size: Optional[int] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
    step: int = 0,
) -> Tuple[bytes, Dict[str, Any]]:
    """Export the trained net as (payload_bytes, metadata_dict)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    B = batch_size or cfg.data.batch_size
    S = image_size or cfg.data.image_size
    in_shape = (B,) + (S,) * cfg.model.dims + (cfg.model.in_channels,)

    serve = build_serving_fn(cfg, params, state)
    exported = jax_export.export(jax.jit(serve), platforms=tuple(platforms))(
        jax.ShapeDtypeStruct(in_shape, jnp.float32))
    payload = exported.serialize()

    meta = {
        "format": "uresnet_tpu-serving",
        "version": FORMAT_VERSION,
        "platforms": list(platforms),
        "input_shape": list(in_shape),
        "input_dtype": "float32",
        "output": "softmax_scores",
        "output_shape": (list(in_shape[:-1]) + [cfg.model.num_class]),
        "trained_step": int(step),
        "model": dataclasses.asdict(cfg.model),
        "preprocess": {
            "normalize_scale": cfg.data.normalize_scale,
            "normalize_clip": cfg.data.normalize_clip,
            "image_size": S,
            "planes": list(cfg.data.planes),
        },
    }
    return payload, meta


def save_serving(path: str, payload: bytes, meta: Dict[str, Any]) -> None:
    blob = json.dumps(meta, sort_keys=True).encode()
    with open(path + ".tmp", "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(blob)))
        f.write(blob)
        f.write(payload)
    import os

    os.replace(path + ".tmp", path)


def load_serving(path: str) -> Tuple[Callable[[np.ndarray], np.ndarray],
                                     Dict[str, Any]]:
    """Deserialize a .uxm artifact -> (callable, metadata).

    The callable takes the normalized dense batch recorded in
    ``meta['input_shape']`` and returns float32 softmax scores. It raises
    on any shape/dtype mismatch (jax.export checks the calling convention)."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path!r} is not a uresnet_tpu serving "
                             f"artifact (bad magic {magic!r})")
        (n,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(n).decode())
        payload = f.read()
    if meta.get("version", 0) > FORMAT_VERSION:
        raise ValueError(
            f"artifact version {meta['version']} is newer than this "
            f"reader ({FORMAT_VERSION})")
    rehydrated = jax_export.deserialize(payload)
    return rehydrated.call, meta
