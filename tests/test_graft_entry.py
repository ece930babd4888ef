"""Driver-hook contract tests: entry() compile-check + multichip dryrun on
the virtual 8-device CPU mesh (SURVEY.md §4)."""

import jax
import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_self_provisions_like_driver():
    """The driver invokes dryrun_multichip in a FRESH interpreter with no
    env setup (MULTICHIP_r01 failed exactly here): the hook must provision
    the virtual CPU mesh itself."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(2)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DP loss" in proc.stdout


def test_entry_traces():
    import __graft_entry__ as g

    fn, args = g.entry()
    # Trace (not execute) the flagship forward: shape/dtype contract only,
    # full 256x256 depth-5 execution is the driver's TPU-side job.
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 256, 256, 3)
