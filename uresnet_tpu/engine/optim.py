"""Optimizer: our own Adam + LR schedules (no optax dependency in the hot path).

Capability parity (SURVEY.md §2.1 "Optimizer wiring"): the reference uses
Adam with LR from config (BN update-ops handled separately; here BN state is
returned functionally by the model, so no control-dependency machinery
exists). Implemented as a pure (init, update) pair over arbitrary pytrees so
it pjit-shards with the params.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from uresnet_tpu.config import OptimConfig


class AdamState(NamedTuple):
    step: jax.Array        # scalar int32
    mu: Any                # first-moment pytree
    nu: Any                # second-moment pytree


def make_schedule(cfg: OptimConfig) -> Callable[[jax.Array], jax.Array]:
    base = cfg.lr

    def sched(step: jax.Array) -> jax.Array:
        s = step.astype(jnp.float32)
        lr = jnp.asarray(base, jnp.float32)
        if cfg.schedule == "cosine":
            total = max(cfg.decay_steps, 1)
            frac = jnp.clip((s - cfg.warmup_steps) / total, 0.0, 1.0)
            lr = lr * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        elif cfg.schedule == "exponential":
            total = max(cfg.decay_steps, 1)
            lr = lr * cfg.decay_rate ** ((s - cfg.warmup_steps) / total)
        elif cfg.schedule != "constant":
            raise ValueError(f"unknown schedule {cfg.schedule!r}")
        if cfg.warmup_steps > 0:
            warm = jnp.clip((s + 1.0) / cfg.warmup_steps, 0.0, 1.0)
            lr = lr * warm
        return lr

    return sched


def freeze_mask(params: Any, patterns) -> Any:
    """Build the ``freeze`` pytree for :func:`adam_update` from regex
    patterns (cfg.optim.freeze — the reference's `trainable` knob,
    SURVEY.md §2.1 model assembly). Each pattern is ``re.search``-ed against
    the leaf's checkpoint-style path (engine/checkpoint._path_str — the same
    names tools/ckpt_info.py prints, e.g. ``stem/conv``,
    ``enc0_block1/cb1/bn/scale``, ``head``). Returns a pytree of Python
    bools (True = frozen). A pattern matching NO leaf raises — a silent
    no-op freeze would be a training bug."""
    import re

    from uresnet_tpu.engine.checkpoint import _path_str

    compiled = [(p, re.compile(p)) for p in patterns]
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    hits = {p: 0 for p, _ in compiled}
    mask = []
    for path, _ in leaves:
        name = _path_str(path)
        frozen = False
        for p, rx in compiled:
            if rx.search(name):
                frozen = True
                hits[p] += 1
        mask.append(frozen)
    dead = [p for p, n in hits.items() if n == 0]
    if dead:
        names = [_path_str(path) for path, _ in leaves]
        raise ValueError(
            f"optim.freeze patterns {dead} match no param leaf; available "
            f"paths (first 10): {names[:10]}")
    if all(mask):
        raise ValueError(
            "optim.freeze freezes EVERY param leaf — nothing would train")
    return jax.tree_util.tree_unflatten(treedef, mask)


def adam_init(params: Any) -> AdamState:
    zeros = lambda p: jnp.zeros_like(p)
    return AdamState(
        step=jnp.zeros((), jnp.int32),
        mu=jax.tree.map(zeros, params),
        nu=jax.tree.map(zeros, params),
    )


def _global_norm(tree: Any) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))


def adam_update(
    grads: Any,
    opt_state: AdamState,
    params: Any,
    cfg: OptimConfig,
    freeze: Any = None,
) -> Tuple[Any, AdamState]:
    """Adam or RMSProp update (cfg.optimizer; SURVEY.md §2.1 notes the
    reference's optimizer is Adam [K:low — could be RMSProp], so both ship).
    Returns (new_params, new_state). Pure; safe under jit/pjit.

    ``freeze``: optional pytree of Python bools matching ``params`` (True =
    frozen). Frozen leaves are exactly untouched — params, mu AND nu — and
    their grads are zeroed BEFORE grad_clip_norm, so the global norm covers
    trainable leaves only (TF1 var_list semantics: non-trainable variables
    never reach the optimizer). The bools are static, so XLA compiles the
    masking away entirely."""
    if freeze is not None:
        grads = jax.tree.map(
            lambda f, g: jnp.zeros_like(g) if f else g, freeze, grads)
    step = opt_state.step + 1
    sched = make_schedule(cfg)
    lr = sched(step)

    if cfg.grad_clip_norm > 0:
        gnorm = _global_norm(grads)
        scale = jnp.minimum(1.0, cfg.grad_clip_norm / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree.map(lambda g: g * scale, grads)

    b1, b2, eps = cfg.b1, cfg.b2, cfg.eps

    def _keep_frozen(new_tree, old_tree):
        # exact freeze: frozen leaves keep their previous value bit-for-bit
        # (zeroed grads alone would still drift them via weight_decay and,
        # after a warm restore, via nonzero-moment decay)
        if freeze is None:
            return new_tree
        return jax.tree.map(
            lambda f, new, old: old if f else new, freeze, new_tree, old_tree)

    if cfg.optimizer == "rmsprop":
        # TF1 RMSPropOptimizer semantics: decay=b2, no momentum term
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * jnp.square(g),
                          opt_state.nu, grads)

        def upd_rms(p, g, v):
            u = g / (jnp.sqrt(v) + eps)
            if cfg.weight_decay > 0:
                u = u + cfg.weight_decay * p
            return (p - lr * u).astype(p.dtype)

        new_params = _keep_frozen(jax.tree.map(upd_rms, params, grads, nu),
                                  params)
        nu = _keep_frozen(nu, opt_state.nu)
        return new_params, AdamState(step=step, mu=opt_state.mu, nu=nu)

    if cfg.optimizer != "adam":
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, opt_state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * jnp.square(g),
                      opt_state.nu, grads)
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    def upd(p, m, v):
        u = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        if cfg.weight_decay > 0:
            u = u + cfg.weight_decay * p
        return (p - lr * u).astype(p.dtype)

    new_params = _keep_frozen(jax.tree.map(upd, params, mu, nu), params)
    mu = _keep_frozen(mu, opt_state.mu)
    nu = _keep_frozen(nu, opt_state.nu)
    return new_params, AdamState(step=step, mu=mu, nu=nu)
