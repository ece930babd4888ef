"""2-process `jax.distributed` worker, spawned by tests/test_distributed.py.

Runs a REAL multi-process SPMD fit + exactly-once evaluation on the CPU
backend (4 virtual devices per process, Gloo cross-process collectives) and
dumps results as JSON for the spawning test to compare against the
single-process reference (SURVEY.md §2.4 process model; §4 "distributed
without a cluster" — this is the one place the suite actually executes
process_count > 1).

Not a pytest module (leading underscore): invoked as
    python tests/_dist_worker.py <rank> <port> <usef-file> <outdir>
"""

import json
import os
import sys


def main() -> int:
    rank, port, usef, outdir = (int(sys.argv[1]), sys.argv[2], sys.argv[3],
                                sys.argv[4])

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=rank)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4 and jax.device_count() == 8

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from uresnet_tpu.engine.evaluator import evaluate_dataset
    from uresnet_tpu.engine.trainer import Trainer

    from _dist_common import dist_config  # shared with the spawning test

    cfg = dist_config(usef, outdir)
    trainer = Trainer(cfg)
    ts, last = trainer.fit(log=False)
    ev = evaluate_dataset(trainer, ts)

    with open(os.path.join(outdir, f"rank{rank}.json"), "w") as f:
        json.dump({"rank": rank,
                   "last": {k: float(v) for k, v in last.items()},
                   "eval": {k: float(v) for k, v in ev.items()}}, f)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
