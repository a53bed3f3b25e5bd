"""Driver entry-point tests: single-chip compile + multi-chip dry run."""

import sys

import jax
import numpy as np

from conftest import REPO_ROOT

sys.path.insert(0, REPO_ROOT)
import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    stats, carry = jax.jit(fn)(*args)
    assert int(stats["bit_errors"]) >= 0
    assert int(stats["symbol_errors"]) >= 0
    assert np.isfinite(float(stats["papr_peak"]))


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)
