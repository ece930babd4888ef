"""Train/eval engine: jit-compiled step functions over a named mesh.

Capability parity (SURVEY.md §2.1 "Orchestrator", reference
`lib/ssnet_trainval.py` [K:med]): owns the full lifecycle the reference's
`ssnet_trainval` owned — data threads, model build, loss, optimizer,
checkpointing, summaries, periodic validation — redesigned the JAX way
(SURVEY.md §3.5): no session, no placeholders; `Trainer.init()` constructs
the mesh, seeds params, spins up the decoder and opens the checkpoint dir;
`train_step` is one donated, pjit-compiled pure function.

Data parallelism (SURVEY.md §2.3/§2.4): the batch is a global array sharded
over the 'data' mesh axis; params/opt state are replicated. Loss/metric
means and BN batch stats reduce over the sharded batch dim, so XLA inserts
the ICI allreduce — the DP step is numerically the single-device step on the
concatenated batch.
"""

from __future__ import annotations

import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import numpy as np

from uresnet_tpu.config import Config
from uresnet_tpu.data.loader import (BatchLoader, device_prefetch,
                                     make_batch_loader, stack_batches)
from uresnet_tpu.engine import checkpoint as ckpt
from uresnet_tpu.engine.augment import augment_batch
from uresnet_tpu.engine.logging import MetricsLogger
from uresnet_tpu.engine.losses import weighted_softmax_xent
from uresnet_tpu.engine.metrics import segmentation_metrics
from uresnet_tpu.engine.optim import (AdamState, adam_init, adam_update,
                                      freeze_mask)
from uresnet_tpu.models.uresnet import uresnet_apply, uresnet_init
from uresnet_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding


class TrainState(NamedTuple):
    params: Any
    model_state: Any          # BN running stats
    opt: AdamState
    key: jax.Array            # trainer PRNG (augmentation etc.)


class Trainer:
    def __init__(self, cfg: Config, *, mesh=None):
        self.cfg = cfg
        if mesh is None:
            mesh = make_mesh(n_data=cfg.parallel.data,
                             n_spatial=max(1, cfg.parallel.spatial),
                             n_model=max(1, cfg.parallel.model))
        self.mesh = mesh
        self._rep = replicated_sharding(self.mesh)
        # Full-model TP (parallel/tp.py tp_state_shardings): params, BN
        # stats and Adam moments channel-sharded over 'model'; GSPMD places
        # the collectives. Canonical layout only — the packed path derives
        # kernels by channel-phase relabeling gathers that contradict a
        # channel sharding.
        axis_sizes = dict(mesh.shape)  # axis name -> size
        self._n_model = axis_sizes.get("model", 1)
        if self._n_model > 1 and cfg.model.pack:
            raise ValueError(
                "parallel.model > 1 (tensor parallelism) requires the "
                "canonical layout — set model.pack: false (the packed "
                "space-to-depth kernels are derived by channel-phase "
                "relabeling gathers, ops/pack.py, which contradict a "
                "channel sharding)")
        # Batch arrays: dim 0 over 'data'; when the mesh has a spatial axis,
        # also shard one spatial dim (H) — GSPMD partitions the convs and
        # inserts the ICI halo exchanges itself (the conv-net CP analog,
        # SURVEY.md §2.3; exactness vs single-device pinned in
        # tests/test_trainer.py::test_spatial_dp_equals_single_device).
        self._spatial_n = axis_sizes.get("spatial", 1)
        if self._n_model > 1 and self._spatial_n > 1:
            # XLA's SPMD partitioner miscompiles a conv whose input is
            # spatially sharded AND whose kernel is output-feature sharded:
            # the result is wrong by O(1) everywhere, not just at halo rows
            # (reproduced with raw lax.conv_general_dilated on jax 0.9.0;
            # canary: tests/test_tp.py::test_spatial_x_model_conv_miscompile
            # — when that test starts failing, XLA is fixed and this guard
            # can be lifted). Until then the combination is rejected.
            raise ValueError(
                "parallel.spatial > 1 and parallel.model > 1 cannot be "
                "combined: XLA's SPMD partitioner miscompiles convs that "
                "are both spatially and output-feature partitioned "
                "(see tests/test_tp.py::test_spatial_x_model_conv_"
                "miscompile). Use data x spatial or data x model meshes.")
        n_data = axis_sizes.get("data", 1)
        if cfg.data.batch_size % max(n_data, 1):
            raise ValueError(
                f"data.batch_size ({cfg.data.batch_size}) must be divisible "
                f"by the mesh data-axis size ({n_data}); raise the batch "
                f"size or set parallel.data to a divisor (e.g. "
                f"parallel.data=1 for single-device runs)")
        if cfg.model.kernel_backend not in ("auto", "xla", "pallas"):
            raise ValueError(
                f"model.kernel_backend must be 'auto', 'xla' or 'pallas', "
                f"got {cfg.model.kernel_backend!r} (consumed by the folded "
                f"inference forward, models/fold.py)")
        if (cfg.model.dims == 3 and not cfg.model.pack
                and jax.devices()[0].platform == "tpu"):
            import sys

            print(
                "[uresnet_tpu] perf warning: 3D without model.pack hits an "
                "8x XLA tile-padding blowup on TPU (29% HBM utilization; "
                "192^3 OOMs outright) — set model.pack: true "
                "(benchmarks/RESULTS.md)", file=sys.stderr)
        if cfg.data.batch_size % 2 and cfg.data.batch_size > 1:
            import sys

            print(
                f"[uresnet_tpu] perf warning: odd batch_size "
                f"({cfg.data.batch_size}) measured ~20%/image slower on TPU "
                f"(XLA pads the batch dim in conv tilings) — prefer an even "
                f"events x planes product (benchmarks/RESULTS.md)",
                file=sys.stderr)
        self._bsh = batch_sharding(
            self.mesh, spatial_dim=1 if self._spatial_n > 1 else None)
        self._bsh_data_only = batch_sharding(self.mesh)
        self._compiled: Dict[str, Any] = {}
        if cfg.optim.freeze:
            self._freeze  # validate the patterns LOUDLY before any training
        self.loader: Optional[BatchLoader] = None
        self.val_loader: Optional[BatchLoader] = None

    @property
    def cfg(self) -> Config:
        return self._cfg

    @cfg.setter
    def cfg(self, new: Config):
        # Compiled executables bake cfg constants (normalize scale/clip,
        # num_class, ...) at first trace and are keyed by name+shape only —
        # swapping the config on a live trainer must invalidate them, or a
        # same-shape call silently reuses stale constants (round-3 review).
        # Mesh/shardings are still fixed at __init__: don't change
        # cfg.parallel on a live trainer, build a new one.
        self._cfg = new
        if getattr(self, "_compiled", None):
            self._compiled.clear()

    _IMAGE_KEYS = ("data", "label", "weight")

    def _leaf_sharding(self, key: str):
        """Dense image leaves shard (batch, H) over (data, spatial); sparse
        point-list leaves (coords/values/npoints/shape) only shard batch."""
        return self._bsh if key in self._IMAGE_KEYS else self._bsh_data_only

    def _stacked_leaf_sharding(self, key: str):
        """Per-leaf sharding for K-stacked batches (leading steps dim is
        replicated; the batch dim moves to axis 1)."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        base = self._leaf_sharding(key)
        return NamedSharding(self.mesh, P(*((None,) + tuple(base.spec))))

    # -- state ---------------------------------------------------------------

    def _host_state(self, seed: int) -> TrainState:
        # uint32 PRNGKey (not typed key) so the key serializes in checkpoints
        k_param, k_train = jax.random.split(jax.random.PRNGKey(seed))
        params, mstate = uresnet_init(k_param, self.cfg.model)
        return TrainState(params=params, model_state=mstate,
                          opt=adam_init(params), key=k_train)

    @property
    def _ts_sh(self):
        """Per-leaf placement of the TrainState: replicated under DP/SP;
        channel-sharded over 'model' under full-model TP."""
        if self._n_model <= 1:
            return self._rep
        if "ts_sh" not in self._compiled:
            from uresnet_tpu.parallel.tp import tp_state_shardings

            seed = self.cfg.train.seed
            abstract = jax.eval_shape(lambda: self._host_state(seed))
            self._compiled["ts_sh"] = tp_state_shardings(self.mesh, abstract)
        return self._compiled["ts_sh"]

    @property
    def _freeze(self):
        """Static bool pytree over params for cfg.optim.freeze (the
        reference's `trainable` knob, SURVEY.md §2.1); None when unset.
        Cached in _compiled so a cfg swap rebuilds it with the executables."""
        if not self.cfg.optim.freeze:
            return None
        if "freeze" not in self._compiled:
            abstract = jax.eval_shape(
                lambda: self._host_state(self.cfg.train.seed)).params
            self._compiled["freeze"] = freeze_mask(
                abstract, self.cfg.optim.freeze)
        return self._compiled["freeze"]

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        seed = self.cfg.train.seed if seed is None else seed
        return jax.device_put(self._host_state(seed), self._ts_sh)

    # -- step functions ------------------------------------------------------

    @property
    def _loss_phases(self) -> int:
        """>1 when the train loss runs on packed-head logits (the d2s-free
        fast path; models/packed.py loss_layout_phases)."""
        if not self.cfg.train.packed_loss:
            return 1
        from uresnet_tpu.models.packed import loss_layout_phases

        return loss_layout_phases(self.cfg.model)

    def _pack_target(self, x):
        """(B, *S[, K]) per-pixel target -> packed-head layout
        (B, *S', phases[, K]), matching the packed logits' phase order."""
        from uresnet_tpu.models.packed import pack_like_logits

        k = None if x.ndim == self.cfg.model.dims + 1 else x.shape[-1]
        p = pack_like_logits(x[..., None] if k is None else x,
                             self.cfg.model)
        if k is None:
            return p                              # (..., phases)
        return p.reshape(p.shape[:-1] + (self._loss_phases, k))

    def _loss_fn(self, params, mstate, batch, train: bool):
        """Returns (loss, ((logits, labels), new_state)) where logits/labels
        are in the LOSS layout: canonical (B,*S,C)/(B,*S), or — on the
        packed train path — (B,*S',phases,C)/(B,*S',phases). Per-pixel
        losses and metrics are layout-invariant, so downstream consumers
        (segmentation_metrics) work on either unchanged."""
        # targets may ARRIVE pre-packed (densify_on_device target_phases)
        arrived = batch["label"].ndim == self.cfg.model.dims + 2
        packed = arrived or (train and self._loss_phases > 1)
        logits, new_mstate = uresnet_apply(
            params, mstate, batch["data"], cfg=self.cfg.model, train=train,
            packed_logits=packed)
        if packed:
            ph = self._loss_phases
            logits = logits.reshape(
                logits.shape[:-1] + (ph, self.cfg.model.num_class))
            labels = (batch["label"] if arrived
                      else self._pack_target(batch["label"]))
            weights = (batch["weight"] if arrived
                       else self._pack_target(batch["weight"]))
        else:
            labels, weights = batch["label"], batch["weight"]
        loss = weighted_softmax_xent(
            logits, labels, weights,
            normalize=self.cfg.train.loss_normalize)
        return loss, ((logits, labels), new_mstate)

    def _prepare(self, batch, *, augment_key=None, packed_targets=False):
        """Sparse-transfer batches are densified ON DEVICE inside the jitted
        step (data/device_pipeline.py) — the host ships ~50x fewer bytes.
        ``augment_key``: fold the random flips/rot90 into the scatter (point
        cost instead of full-image passes). ``packed_targets``: scatter
        label/weight directly into the packed loss layout."""
        if "coords" not in batch:
            return batch
        from uresnet_tpu.data.device_pipeline import densify_on_device
        from uresnet_tpu.models.packed import _hpack_level

        d = self.cfg.data
        dense = densify_on_device(
            batch, image_size=d.image_size,
            num_class=self.cfg.model.num_class,
            normalize_scale=d.normalize_scale,
            normalize_clip=d.normalize_clip,
            weight_mode=d.weight_mode,
            nonzero_boost=d.weight_nonzero_boost,
            augment_key=augment_key,
            target_phases=self._loss_phases if packed_targets else 1,
            target_hpack=(packed_targets
                          and _hpack_level(self.cfg.model, 0)))
        if self._spatial_n > 1:
            dense = jax.lax.with_sharding_constraint(
                dense, jax.tree.map(lambda _: self._bsh, dense))
        return dense

    def _train_step(self, ts: TrainState, batch,
                    with_metrics: bool = True,
                    metrics_pred=None) -> Tuple[TrainState, Dict]:
        key, k_aug = jax.random.split(ts.key)
        sparse = "coords" in batch
        batch = self._prepare(
            batch,
            augment_key=k_aug if (sparse and self.cfg.data.augment) else None,
            packed_targets=sparse and self._loss_phases > 1)
        if self.cfg.data.augment and not sparse:
            batch = augment_batch(k_aug, batch, dims=self.cfg.model.dims)
        loss_fn = self._loss_fn
        if self._freeze is not None:
            # stop_gradient on frozen leaves BEFORE the forward: their grads
            # come out as exact zeros and XLA dead-code-eliminates the whole
            # weight-grad computation for those convs — freezing prunes the
            # backward pass, it doesn't just mask the update. Activation
            # gradients still flow THROUGH frozen layers to earlier
            # trainable params (stop_gradient cuts only the param->output
            # edge). adam_update's freeze masking stays as the exactness
            # guarantee (moments + weight_decay untouched bit-for-bit).
            frz = self._freeze

            def loss_fn(params, mstate, batch, train):
                params = jax.tree.map(
                    lambda f, p: jax.lax.stop_gradient(p) if f else p,
                    frz, params)
                return self._loss_fn(params, mstate, batch, train)

        (loss, ((logits, labels), mstate)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params, ts.model_state, batch, True)
        params, opt = adam_update(grads, ts.opt, ts.params, self.cfg.optim,
                                  freeze=self._freeze)
        # metrics (argmax + per-class IoU passes over the full batch) are
        # only read every summary_iter steps — the hot step skips them
        metrics = {"loss": loss}
        if with_metrics:
            def _metrics():
                data = (self._pack_target(batch["data"])
                        if logits.ndim != batch["data"].ndim
                        else batch["data"])
                return segmentation_metrics(
                    logits, labels, data,
                    num_class=self.cfg.model.num_class)

            if metrics_pred is None:
                metrics.update(_metrics())
            else:
                # inside a fused multi-step scan: only the LAST step's
                # metrics are read — lax.cond skips the argmax/IoU passes
                # on the other k-1 iterations
                import jax.numpy as jnp

                zeros = {k: jnp.zeros((), jnp.float32)
                         for k in ("acc_all", "acc_nonzero", "miou",
                                   *(f"iou_class{c}" for c in
                                     range(self.cfg.model.num_class)))}
                metrics.update(jax.lax.cond(
                    metrics_pred,
                    lambda: {k: v.astype(jnp.float32)
                             for k, v in _metrics().items()},
                    lambda: zeros))
        new_ts = TrainState(params=params, model_state=mstate, opt=opt, key=key)
        return new_ts, metrics

    def _eval_step(self, ts: TrainState, batch) -> Dict:
        batch = self._prepare(batch)
        loss, ((logits, labels), _) = self._loss_fn(
            ts.params, ts.model_state, batch, False)
        metrics = segmentation_metrics(
            logits, labels, batch["data"],
            num_class=self.cfg.model.num_class)
        metrics["loss"] = loss
        return metrics

    def _forward(self, ts: TrainState, data) -> jax.Array:
        """Inference forward: per-pixel softmax scores (SURVEY.md §3.2)."""
        logits, _ = uresnet_apply(ts.params, ts.model_state, data,
                                  cfg=self.cfg.model, train=False)
        return jax.nn.softmax(logits, axis=-1)

    # -- compiled accessors ----------------------------------------------------

    def _make_train_step(self, with_metrics: bool):
        key = f"train_{with_metrics}"
        if key not in self._compiled:
            import functools

            self._compiled[key] = jax.jit(
                functools.partial(self._train_step,
                                  with_metrics=with_metrics),
                in_shardings=(self._ts_sh, None),  # batch: per-leaf placement
                out_shardings=(self._ts_sh, self._rep),
                donate_argnums=(0,),
            )
        return self._compiled[key]

    @property
    def train_step(self):
        return self._make_train_step(True)

    @property
    def train_step_light(self):
        """Metric-free hot-loop step (loss only in the metrics dict)."""
        return self._make_train_step(False)

    def train_step_multi(self, k: int, with_metrics: bool):
        """K train steps fused into ONE executable over K STACKED batches
        (each leaf gains a leading steps dim): one host->device transfer and
        one dispatch per K steps. This is the production host-training-loop
        (cfg.train.steps_per_dispatch) — per-step math is IDENTICAL to
        `train_step` (same body under lax.scan; trajectory equivalence pinned
        in tests/test_trainer.py::test_steps_per_dispatch_bit_exact), it
        only amortizes per-step dispatch/transfer latency, the measured e2e
        bottleneck on remote-relay hosts (benchmarks/RESULTS.md round 2).
        Metrics are the LAST step's."""
        key = f"train_multi_{k}_{with_metrics}"
        if key not in self._compiled:
            def multi_fn(ts, batches):
                import jax.numpy as jnp

                idx = jnp.arange(k)

                def body(ts, xs):
                    batch, i = xs
                    return self._train_step(
                        ts, batch, with_metrics=with_metrics,
                        # only the last step's metrics are read — skip the
                        # argmax/IoU passes on the other k-1 iterations
                        metrics_pred=(i == k - 1) if with_metrics else None)

                ts, ms = jax.lax.scan(body, ts, (batches, idx))
                return ts, jax.tree.map(lambda m: m[-1], ms)

            self._compiled[key] = jax.jit(
                multi_fn,
                in_shardings=(self._ts_sh, None),  # batches: per-leaf placement
                out_shardings=(self._ts_sh, self._rep),
                donate_argnums=(0,),
            )
        return self._compiled[key]

    def train_step_scan(self, k: int):
        """K chained train steps fused into ONE executable via lax.scan
        (same batch each iteration). One device dispatch for k steps —
        measures/delivers steady-state device throughput when per-step host
        dispatch latency would otherwise dominate (e.g. remote relays)."""
        key = f"train_scan_{k}"
        if key not in self._compiled:
            def scan_fn(ts, batch):
                def body(ts, _):
                    return self._train_step(ts, batch, with_metrics=False)

                ts, ms = jax.lax.scan(body, ts, None, length=k)
                return ts, jax.tree.map(lambda m: m[-1], ms)

            self._compiled[key] = jax.jit(
                scan_fn,
                in_shardings=(self._ts_sh, self._bsh),
                out_shardings=(self._ts_sh, self._rep),
                donate_argnums=(0,),
            )
        return self._compiled[key]

    @property
    def eval_step(self):
        if "eval" not in self._compiled:
            self._compiled["eval"] = jax.jit(
                self._eval_step,
                in_shardings=(self._ts_sh, None),
                out_shardings=self._rep,
            )
        return self._compiled["eval"]

    @property
    def forward(self):
        if "forward" not in self._compiled:
            self._compiled["forward"] = jax.jit(
                self._forward,
                in_shardings=(self._ts_sh, self._bsh),
                out_shardings=self._bsh,
            )
        return self._compiled["forward"]

    # -- data -----------------------------------------------------------------

    def _device_batch_with(self, leaf_sh):
        """Batch device-placement fn using the given per-leaf sharding
        (plain or K-stacked)."""
        multi_host = jax.process_count() > 1

        def put(k, v):
            if multi_host:
                # each host holds its 1/process_count slice of the global
                # batch (sharded loader); assemble the global array from
                # process-local data (SURVEY.md §2.4 multi-host SPMD)
                return jax.make_array_from_process_local_data(leaf_sh(k), v)
            return jax.device_put(v, leaf_sh(k))

        def put_batch(batch):
            return {k: (put(k, v) if isinstance(v, np.ndarray) and v.ndim > 0
                        else v)
                    for k, v in batch.items()}

        return put_batch

    def _device_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        return self._device_batch_with(self._leaf_sharding)(batch)

    def make_loader(self, *, train: bool = True, start_event: int = 0):
        dcfg = self.cfg.data
        if not train and dcfg.synthetic and not dcfg.input_files:
            # held-out synthetic validation: different generator seed, so
            # val metrics are not measured on the training events
            import dataclasses

            dcfg = dataclasses.replace(dcfg, seed=dcfg.seed + 10007)
        return make_batch_loader(
            dcfg, num_class=self.cfg.model.num_class, train=train,
            ndims=self.cfg.model.dims, start_event=start_event,
            shard=(jax.process_index(), jax.process_count()))

    # -- checkpoint -----------------------------------------------------------

    def _gather_replicated(self, ts: TrainState) -> TrainState:
        """Gather a (possibly model-sharded) TrainState to replicated so
        every leaf is process-addressable before a host readback. Under
        multi-host TP a channel-sharded leaf spans processes and
        jax.device_get would raise; under DP/SP the state is already
        replicated and this is a no-op."""
        if self._n_model <= 1:
            return ts
        if "gather_rep" not in self._compiled:
            self._compiled["gather_rep"] = jax.jit(
                lambda t: t, out_shardings=self._rep)
        return self._compiled["gather_rep"](ts)

    def save(self, ts: TrainState, step: int, data_cursor: int = 0) -> str:
        tree = {"train_state": jax.device_get(self._gather_replicated(ts)),
                "meta": {"step": np.int64(step),
                         "data_cursor": np.int64(data_cursor)}}
        return ckpt.save_checkpoint(self.cfg.train.checkpoint_dir, step, tree)

    def restore(self, path: Optional[str] = None) -> Tuple[TrainState, int, int]:
        path = path or self.cfg.train.load_file or None
        if path is None:
            path = ckpt.latest_checkpoint(self.cfg.train.checkpoint_dir)
        if path is None:
            hint = ""
            if jax.process_count() > 1:
                # multi-host runs save from process 0 only; a host-local
                # checkpoint_dir therefore breaks resume on the other hosts
                hint = (" — multi-host runs write checkpoints from process 0"
                        " only, so train.checkpoint_dir must be on a"
                        " filesystem shared by all hosts")
            raise FileNotFoundError(
                f"no checkpoint in {self.cfg.train.checkpoint_dir!r}{hint}")
        # host-built template: never touches the mesh (a sharded template
        # would be non-addressable under multi-host TP)
        template = {"train_state":
                    jax.device_get(self._host_state(self.cfg.train.seed)),
                    "meta": {"step": np.int64(0), "data_cursor": np.int64(0)}}
        # params-only RELEASE artifacts (tools/make_release_ckpt.py) carry
        # no optimizer/PRNG leaves; the fine-tune restore path fills them
        # from the fresh template (they are replaced below anyway)
        tree = ckpt.load_checkpoint(path, template,
                                    partial=self._params_only_path(path))
        loaded = TrainState(*tree["train_state"])
        if self._params_only_path(path):
            # fine-tune restore (train.load_params_only): pretrained params
            # + BN stats with a FRESH optimizer/PRNG at step 0 — the
            # reference's restore-then-retrain workflow. Only the pretrained
            # load_file gets this; the run's own checkpoints resume fully.
            fresh = TrainState(*template["train_state"])
            loaded = TrainState(params=loaded.params,
                                model_state=loaded.model_state,
                                opt=adam_init(loaded.params),
                                key=fresh.key)
            ts = jax.device_put(loaded, self._ts_sh)
            return ts, 0, 0
        ts = jax.device_put(loaded, self._ts_sh)
        return ts, int(tree["meta"]["step"]), int(tree["meta"]["data_cursor"])

    def _params_only_path(self, path: str) -> bool:
        import os

        lf = self.cfg.train.load_file
        return (self.cfg.train.load_params_only and bool(lf)
                and os.path.abspath(path) == os.path.abspath(lf))

    # -- fit loop ---------------------------------------------------------------

    def fit(self, iterations: Optional[int] = None, *, resume: bool = False,
            log: bool = True) -> Tuple[TrainState, Dict[str, float]]:
        cfg = self.cfg
        iters = iterations if iterations is not None else cfg.train.iterations
        start_step, cursor = 0, 0
        if resume or cfg.train.load_file:
            try:
                # --resume prefers the run's OWN latest checkpoint over
                # train.load_file: a preempted fine-tune restart must not
                # silently reload the pretrained file and lose progress
                path = (ckpt.latest_checkpoint(cfg.train.checkpoint_dir)
                        if resume else None)
                ts, start_step, cursor = self.restore(path)
            except FileNotFoundError:
                ts = self.init_state()
        else:
            ts = self.init_state()

        loader = self.make_loader(train=True, start_event=cursor)
        loader.start()
        self.loader = loader
        # Multi-host SPMD: metrics/checkpoints are replicated, so only the
        # leader writes — per-host writes to shared paths would interleave
        # (SURVEY.md §2.4 multi-host).
        main_process = jax.process_index() == 0
        if main_process:
            logger = MetricsLogger(cfg.train.log_dir, name="train", echo=log)
            val_logger = MetricsLogger(cfg.train.log_dir, name="val", echo=log)
        else:
            from uresnet_tpu.engine.logging import NullLogger

            logger = NullLogger()
            val_logger = NullLogger()
        last: Dict[str, float] = {}
        K = max(1, int(cfg.train.steps_per_dispatch))
        if K > 1:
            for name, period in (("summary_iter", cfg.train.summary_iter),
                                 ("val_iter", cfg.train.val_iter),
                                 ("checkpoint_iter", cfg.train.checkpoint_iter),
                                 ("iterations", iters)):
                if period and period % K:
                    raise ValueError(
                        f"train.{name} ({period}) must be a multiple of "
                        f"train.steps_per_dispatch ({K})")
            host_it = stack_batches(iter(loader), K)
            leaf_sh = self._stacked_leaf_sharding
        else:
            host_it = iter(loader)
            leaf_sh = self._leaf_sharding
        it = device_prefetch(
            host_it, sharding=leaf_sh,
            depth=cfg.data.prefetch_depth,
            put_fn=(self._device_batch_with(leaf_sh)
                    if jax.process_count() > 1 else None))
        # Preemption contract (SURVEY.md §5 failure recovery): preemptible
        # TPU VMs deliver SIGTERM before reclaim. Finish the in-flight
        # step, checkpoint, and leave the loop cleanly so --resume
        # continues bit-exactly. Handler installation is skipped off the
        # main thread (signal.signal raises there — e.g. fit under a test
        # harness thread); each process receives its own SIGTERM but only
        # the leader writes, like every other checkpoint.
        preempted = {"flag": False}
        _NOT_INSTALLED = object()   # distinct from a None (C-level) handler
        prev_sigterm = _NOT_INSTALLED
        sync_preempt = None
        if cfg.train.preempt_save:
            import signal

            def _on_sigterm(signum, frame):
                preempted["flag"] = True

            try:
                prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
            except ValueError:
                prev_sigterm = _NOT_INSTALLED
            if jax.process_count() > 1:
                # SIGTERM delivery is per-process; without alignment hosts
                # could break out of the SPMD loop at different steps and
                # deadlock the others inside a collective — losing the very
                # checkpoint this feature exists to write. One tiny
                # allgather per step (multi-host only) makes the break step
                # identical everywhere.
                from jax.experimental import multihost_utils

                def sync_preempt(local: bool) -> bool:
                    return bool(multihost_utils.process_allgather(
                        np.asarray(local, np.float32)).max())
        t_last = time.time()
        cursor_now = cursor
        try:
            for step in range(start_step + K, start_step + iters + 1, K):
                batch = next(it)
                cursor_now = int(batch.pop("cursor", 0))
                summary = (step % cfg.train.summary_iter == 0
                           or step == start_step + iters)
                if K > 1:
                    step_fn = self.train_step_multi(K, summary)
                else:
                    step_fn = (self.train_step if summary
                               else self.train_step_light)
                ts, metrics = step_fn(ts, batch)
                if summary:
                    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                    dt = time.time() - t_last
                    n_img = cfg.data.batch_size * cfg.train.summary_iter
                    m["images_per_sec"] = n_img / max(dt, 1e-9)
                    # decode-queue depth: starvation visibility (SURVEY.md §5)
                    q = getattr(loader, "_q", None)
                    if q is not None:
                        m["decode_queue_depth"] = float(q.qsize())
                    t_last = time.time()
                    logger.log(step, m)
                    last = m
                if cfg.train.val_iter and step % cfg.train.val_iter == 0:
                    vm = self.validate(ts, num_batches=cfg.train.val_batches)
                    val_logger.log(step, vm)
                if cfg.train.checkpoint_iter and step % cfg.train.checkpoint_iter == 0:
                    if main_process:
                        self.save(ts, step, cursor_now)
                hit = (sync_preempt(preempted["flag"]) if sync_preempt
                       else preempted["flag"])
                if hit:
                    if main_process:
                        path = self.save(ts, step, cursor_now)
                        print(f"[uresnet_tpu] SIGTERM: checkpoint saved at "
                              f"step {step} -> {path}; resume with --resume",
                              flush=True)
                    last["preempted_at_step"] = float(step)
                    break
            else:
                if main_process:
                    self.save(ts, start_step + iters, cursor_now)
        finally:
            if prev_sigterm is not _NOT_INSTALLED:
                import signal

                # a None previous handler means it was installed at the C
                # level and cannot be re-installed from Python — restore
                # SIG_DFL (terminate, the SIGTERM default) rather than
                # leaving our dead flag-setting closure in place
                signal.signal(signal.SIGTERM,
                              prev_sigterm if prev_sigterm is not None
                              else signal.SIG_DFL)
            # release BOTH loaders: worker threads and (for the C++ decoder)
            # the native handle must not leak per fit() call
            loader.stop()
            if hasattr(loader, "close"):
                loader.close()
            self.loader = None
            if self.val_loader is not None:
                self.val_loader.stop()
                if hasattr(self.val_loader, "close"):
                    self.val_loader.close()
                self.val_loader = None
            logger.close()
            val_logger.close()
        return ts, last

    def validate(self, ts: TrainState, *, num_batches: int = 8) -> Dict[str, float]:
        """In-loop validation: sampled per-batch means by default; with
        cfg.train.val_exact, the exactly-once full-dataset pass (the same
        machinery as the mIoU parity gate — well-defined dataset metrics,
        every held-out event counted once)."""
        if self.cfg.train.val_exact:
            from uresnet_tpu.engine.evaluator import evaluate_dataset

            return evaluate_dataset(self, ts)
        if self.val_loader is None:
            self.val_loader = self.make_loader(train=False)
        agg: Dict[str, float] = {}
        for _ in range(num_batches):
            batch = self.val_loader.next()
            batch.pop("cursor", None)
            m = jax.device_get(self.eval_step(ts, self._device_batch(batch)))
            for k, v in m.items():
                agg[k] = agg.get(k, 0.0) + float(v) / num_batches
        return agg
