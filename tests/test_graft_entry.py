"""Driver-hook contract tests: entry() compile-check + multichip dryrun on
the virtual 8-device CPU mesh (SURVEY.md §4)."""

import jax
import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_traces():
    import __graft_entry__ as g

    fn, args = g.entry()
    # Trace (not execute) the flagship forward: shape/dtype contract only,
    # full 256x256 depth-5 execution is the driver's TPU-side job.
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 256, 256, 3)
