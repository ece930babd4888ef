"""Batch loader + device-side prefetch.

Capability parity (SURVEY.md §2.1/§3.4): the reference's `larcv_threadio`
contract — configure(files, batch size, threads, random access), start,
`next()` returning (data, label, weight) batches filled ahead of the
training loop by native worker threads — without the per-step host->device
`feed_dict` copy (SURVEY.md §3.1 notes that as a reference inefficiency):
batches move to the device asynchronously via a depth-K prefetch queue, so
the TPU never waits on decode.

Two host-side producers with identical semantics:
  * the C++ threaded decoder (`cxx/decoder`, via `uresnet_tpu.data.cxx_decoder`)
    — the production path (SURVEY.md §2.2);
  * this module's Python threaded producer — portable fallback, and the
    semantics oracle the C++ path is tested against (SURVEY.md §4).
"""

from __future__ import annotations

import os
import queue
import tempfile
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from uresnet_tpu.config import DataConfig
from uresnet_tpu.data import events as ev
from uresnet_tpu.data.pipeline import densify_batch, sparse_batch


def resolve_input_files(cfg: DataConfig, ndims: int) -> list:
    """Input files, materializing the cached synthetic USEF file if needed."""
    if cfg.input_files:
        return list(cfg.input_files)
    if not cfg.synthetic:
        raise ValueError("no input files and synthetic=False")
    from uresnet_tpu.data.synthetic import generate_file

    shape = (max(cfg.image_size, 256),) * ndims
    cache = os.path.join(
        tempfile.gettempdir(),
        f"uresnet_synth_{ndims}d_{cfg.synthetic_events}"
        f"_{shape[0]}_{cfg.seed}_p{'-'.join(map(str, cfg.planes))}.usef",
    )
    if not os.path.exists(cache):
        generate_file(cache + ".tmp", cfg.synthetic_events, seed=cfg.seed,
                      shape=shape, planes=tuple(cfg.planes))
        os.replace(cache + ".tmp", cache)
    return [cache]


def make_batch_loader(cfg: DataConfig, *, num_class: int = 3,
                      train: bool = True, ndims: int = 2,
                      start_event: int = 0, shard: tuple = (0, 1)):
    """Backend-selecting factory: native C++ decoder when built and
    requested ('cxx' or 'auto'), Python fallback otherwise. Both support
    multi-host input sharding: shard=(rank, count) reads every count-th
    event and produces this host's 1/count slice of the GLOBAL batch."""
    files = resolve_input_files(cfg, ndims)
    if cfg.backend in ("cxx", "auto"):
        from uresnet_tpu.data import cxx_decoder

        if cxx_decoder.available():
            return cxx_decoder.CxxBatchLoader(
                cfg, num_class=num_class, train=train, ndims=ndims,
                start_event=start_event, files=files, shard=shard)
        if cfg.backend == "cxx":
            raise OSError("backend='cxx' requested but liburesnet_decoder.so "
                          "is not built (make -C cxx/decoder)")
    import dataclasses

    return BatchLoader(dataclasses.replace(cfg, input_files=tuple(files)),
                       num_class=num_class, train=train, ndims=ndims,
                       start_event=start_event, shard=shard)


class BatchLoader:
    """Threaded host-side batch producer over USEF files.

    ``batch_size`` counts images (= events x selected planes). Iteration is
    infinite (cycling the event list); ``epoch_order`` reshuffles per epoch
    when ``random_access`` else sequential — matching larcv ThreadProcessor's
    RandomAccess knob (SURVEY.md §2.1 larcv IO configs).
    """

    def __init__(
        self,
        cfg: DataConfig,
        *,
        num_class: int = 3,
        train: bool = True,
        ndims: int = 2,
        start_event: int = 0,
        queue_depth: Optional[int] = None,
        shard: tuple = (0, 1),
    ):
        """`shard=(rank, count)`: multi-host SPMD input sharding (SURVEY.md
        §2.3 "sharded input pipeline") — this host reads every count-th
        event and produces its 1/count slice of the GLOBAL batch
        (cfg.batch_size stays the global size)."""
        self.cfg = cfg
        self.num_class = num_class
        self.train = train
        self.ndims = ndims
        self.shard = shard
        self._files = resolve_input_files(cfg, ndims)
        # global event index: (file_idx, event_idx), sharded per host
        self._index = []
        pos = 0
        for fi, path in enumerate(self._files):
            n = ev.num_events(path)
            for ei in range(n):
                if pos % shard[1] == shard[0]:
                    self._index.append((fi, ei))
                pos += 1
        if not self._index:
            raise ValueError("no events in input files (after sharding)")
        rows_per_event = max(len(cfg.planes), 1)
        global_events = max(1, cfg.batch_size // rows_per_event)
        if global_events % shard[1]:
            raise ValueError(
                f"events per batch ({global_events}) must be divisible by "
                f"the host count ({shard[1]})")
        self._events_per_batch = max(1, global_events // shard[1])
        self._cursor = start_event % len(self._index)
        self._rng = np.random.default_rng(cfg.seed)
        self._order = np.arange(len(self._index))
        if cfg.random_access and train:
            self._rng.shuffle(self._order)
        self._q: queue.Queue = queue.Queue(
            maxsize=queue_depth or cfg.num_batch_storage)
        self._stop = threading.Event()
        self._threads = []
        self._lock = threading.Lock()

    # -- producer ------------------------------------------------------------

    def _next_indices(self, n: int):
        with self._lock:
            out = []
            for _ in range(n):
                if self._cursor >= len(self._order):
                    self._cursor = 0
                    if self.cfg.random_access and self.train:
                        self._rng.shuffle(self._order)
                out.append(self._order[self._cursor])
                self._cursor += 1
            cursor = self._cursor
        return [self._index[i] for i in out], cursor

    def _make_batch(self) -> Dict[str, np.ndarray]:
        idxs, cursor = self._next_indices(self._events_per_batch)
        by_file: Dict[int, list] = {}
        for fi, ei in idxs:
            by_file.setdefault(fi, []).append(ei)
        evs = []
        for fi, eis in by_file.items():
            evs.extend(ev.read_events(self._files[fi], eis))
        if self.cfg.transfer == "sparse":
            batch = sparse_batch(evs, planes=self.cfg.planes,
                                 max_points=self.cfg.max_points,
                                 ndims=self.ndims)
        else:
            batch = densify_batch(
                evs,
                image_size=self.cfg.image_size,
                planes=self.cfg.planes,
                normalize_scale=self.cfg.normalize_scale,
                normalize_clip=self.cfg.normalize_clip,
                weight_mode=self.cfg.weight_mode,
                num_class=self.num_class,
                nonzero_boost=self.cfg.weight_nonzero_boost,
            )
        batch["cursor"] = np.int64(cursor)
        return batch

    def _worker(self):
        while not self._stop.is_set():
            try:
                b = self._make_batch()
            except Exception:  # surface in consumer
                self._q.put(None)
                raise
            while not self._stop.is_set():
                try:
                    self._q.put(b, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def start(self, num_threads: Optional[int] = None) -> "BatchLoader":
        n = num_threads if num_threads is not None else self.cfg.num_threads
        for _ in range(max(1, n)):
            t = threading.Thread(target=self._worker, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def next(self) -> Dict[str, np.ndarray]:
        if not self._threads:
            return self._make_batch()  # synchronous mode
        b = self._q.get()
        if b is None:
            raise RuntimeError("loader worker died; see traceback above")
        return b

    def stop(self):
        self._stop.set()
        while True:  # drain so workers blocked on put() can exit
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        for t in self._threads:
            t.join(timeout=2.0)
        self._threads = []

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield self.next()

    @property
    def cursor(self) -> int:
        with self._lock:
            return self._cursor

    def seek(self, cursor: int):
        """Restore the data cursor (checkpoint/resume contract, SURVEY.md §5)."""
        with self._lock:
            self._cursor = int(cursor) % len(self._order)


def device_prefetch(it: Iterator[dict], *, sharding=None, depth: int = 2,
                    put_fn=None):
    """Asynchronously stage host batches onto the device(s).

    `jax.device_put` is async: enqueueing `depth` batches ahead overlaps
    host->device DMA with the current step (the rebuild's replacement for
    the reference's per-step feed_dict copy, SURVEY.md §3.1).

    `sharding` may be a Sharding (applied to every array leaf) or a callable
    ``key -> Sharding`` (per-leaf placement, e.g. sparse point lists only
    shard the batch dim).
    """
    import jax

    def put(b):
        if put_fn is not None:  # e.g. multi-host global-array assembly
            return put_fn(b)
        arrays = {k: v for k, v in b.items() if isinstance(v, np.ndarray) and v.ndim > 0}
        scalars = {k: v for k, v in b.items() if k not in arrays}
        if callable(sharding):
            staged = {k: jax.device_put(v, sharding(k)) for k, v in arrays.items()}
        elif sharding is not None:
            staged = {k: jax.device_put(v, sharding) for k, v in arrays.items()}
        else:
            staged = {k: jax.device_put(v) for k, v in arrays.items()}
        staged.update(scalars)
        return staged

    buf = []
    for b in it:
        buf.append(put(b))
        if len(buf) > depth:
            yield buf.pop(0)
