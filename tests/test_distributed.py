"""REAL multi-process SPMD: two `jax.distributed` processes (Gloo CPU
collectives, 4 virtual devices each) run `Trainer.fit` + the exactly-once
`evaluate_dataset` on a shared USEF file, compared against the
single-process reference (SURVEY.md §2.4 process model).

Everything else multi-host in the suite is inferred from single-process
unit tests (round-robin shard math, leader gating, SPMD-safe batch
counts); this is the one place `--distributed`'s code path — real
`jax.distributed.initialize`, `make_array_from_process_local_data` over
process-local shards, cross-process collectives, leader-gated writes —
actually executes with process_count > 1.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from uresnet_tpu.data.loader import BatchLoader

from _dist_common import ITERATIONS, SUMMARY_ITER, dist_config

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def dist_run(tmp_path_factory):
    """Spawn the 2-process run once; several tests assert on its outputs."""
    tmp = tmp_path_factory.mktemp("dist")
    from uresnet_tpu.data.synthetic import generate_file

    usef = generate_file(str(tmp / "events.usef"), 16, seed=11,
                         shape=(64, 64), planes=(0,))
    outdir = str(tmp / "out")
    os.makedirs(outdir)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(_HERE, "_dist_worker.py"),
         str(rank), str(port), usef, outdir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for rank in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    results = []
    for rank in (0, 1):
        with open(os.path.join(outdir, f"rank{rank}.json")) as f:
            results.append(json.load(f))
    return {"usef": usef, "outdir": outdir, "results": results}


def test_two_process_fit_matches_single_process(dist_run):
    """The 2-process DP fit's loss trajectory equals the single-process step
    on the concatenated global batch (same 8-device mesh topology; the
    global row order is [proc0 shard, proc1 shard] because
    make_array_from_process_local_data places each process's rows on its
    own addressable devices)."""
    cfg = dist_config(dist_run["usef"], dist_run["outdir"] + "_ref")
    from uresnet_tpu.engine.trainer import Trainer

    trainer = Trainer(cfg)
    ts = trainer.init_state()
    # reproduce the global batch stream: concat the two hosts' round-robin
    # shard loaders in process order (synchronous _make_batch: exact stream)
    l0 = BatchLoader(cfg.data, num_class=3, ndims=2, shard=(0, 2))
    l1 = BatchLoader(cfg.data, num_class=3, ndims=2, shard=(1, 2))
    last = None
    for step in range(1, ITERATIONS + 1):
        b0, b1 = l0._make_batch(), l1._make_batch()
        b0.pop("cursor"), b1.pop("cursor")
        batch = {k: np.concatenate([b0[k], b1[k]]) for k in b0}
        ts, metrics = trainer.train_step(ts, trainer._device_batch(batch))
        if step % SUMMARY_ITER == 0:
            last = {k: float(v) for k, v in metrics.items()}

    got = dist_run["results"][0]["last"]
    for k in ("loss", "acc_all", "acc_nonzero", "miou"):
        assert np.isclose(got[k], last[k], rtol=1e-5, atol=1e-7), \
            f"{k}: 2-process {got[k]!r} vs single-process {last[k]!r}"


def test_two_process_eval_is_replicated_and_exact(dist_run):
    """Both ranks report the IDENTICAL dataset-global eval (replicated SPMD
    outputs), and the exactly-once witnesses count every pixel once."""
    r0, r1 = (r["eval"] for r in dist_run["results"])
    assert r0 == r1, "ranks disagree on replicated eval metrics"
    # 16 events x 64^2 pixels, each counted exactly once
    assert r0["n_pixels"] == 16 * 64 * 64
    assert r0["n_events"] == 16


def test_two_process_eval_counts_match_single_process(dist_run):
    """Restore the 2-process run's final checkpoint single-process and rerun
    the exactly-once gate: the dataset-global confusion metrics must agree
    EXACTLY (integer-valued count sums are permutation-invariant), proving
    the SPMD-safe batch-count/masking logic is topology-independent."""
    import dataclasses

    from uresnet_tpu.engine.evaluator import evaluate_dataset
    from uresnet_tpu.engine.trainer import Trainer

    cfg = dist_config(dist_run["usef"], dist_run["outdir"])
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, load_file=""))
    trainer = Trainer(cfg)
    ts, step, _ = trainer.restore()
    assert step == ITERATIONS
    ev = evaluate_dataset(trainer, ts)
    dist_ev = dist_run["results"][0]["eval"]
    for k, v in ev.items():
        if k == "loss":  # f32 sum order differs across topologies
            assert np.isclose(v, dist_ev[k], rtol=1e-5)
        else:
            assert v == dist_ev[k], (k, v, dist_ev[k])


def test_two_process_leader_gated_writes(dist_run):
    """Only process 0 writes to the shared log/checkpoint dirs: each logged
    step appears exactly once (a double-writer would duplicate rows)."""
    log = os.path.join(dist_run["outdir"], "log", "train_metrics.jsonl")
    with open(log) as f:
        steps = [json.loads(line)["step"] for line in f]
    expected = list(range(SUMMARY_ITER, ITERATIONS + 1, SUMMARY_ITER))
    assert steps == expected, steps
    # exactly one checkpoint tree, written once (atomic rename, no clutter)
    ckpts = sorted(os.listdir(os.path.join(dist_run["outdir"], "ckpt")))
    assert any(str(ITERATIONS) in c for c in ckpts), ckpts
