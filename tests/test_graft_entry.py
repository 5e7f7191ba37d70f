"""Driver entry-point tests: entry() compiles (shape-level) and
dryrun_multichip runs a real sharded train step on the fake 8-device mesh."""

import jax
import pytest

import __graft_entry__ as ge


def test_entry_shapes():
    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (4, 7, 7, 30)


def test_dryrun_multichip_8():
    assert jax.device_count() == 8
    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    ge.dryrun_multichip(2)
