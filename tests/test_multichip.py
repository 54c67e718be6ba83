"""Multi-chip sharding tests on the 8-device virtual CPU mesh: sharded
training step (gradient all-reduce via XLA) and candidate-sharded CEM."""

import jax
import numpy as np

from __graft_entry__ import dryrun_multichip, entry


def test_entry_compiles():
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape[1:] == (48, 64, 3)


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    dryrun_multichip(8)
