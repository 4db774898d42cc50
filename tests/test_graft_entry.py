"""Driver entry points must always compile and run (the harness depends on
them; a refactor that changes the iteration signature must fail HERE, not in
the driver)."""
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    x_new, u_new, total = out
    assert np.isfinite(float(total))
    assert x_new.shape[0] == u_new.shape[0] + 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip():
    graft.dryrun_multichip(8)
