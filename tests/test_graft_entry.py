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


def test_with_device_count_replaces_stale_flag():
    """A stale smaller count must be REWRITTEN, not kept — a leftover
    --xla_force_host_platform_device_count=4 would otherwise starve the
    subprocess dry run of devices."""
    from __graft_entry__ import _with_device_count

    assert _with_device_count("", 8) == \
        "--xla_force_host_platform_device_count=8"
    assert _with_device_count(
        "--xla_force_host_platform_device_count=4", 8) == \
        "--xla_force_host_platform_device_count=8"
    out = _with_device_count(
        "--foo=1 --xla_force_host_platform_device_count=4 --bar=2", 8)
    assert "--xla_force_host_platform_device_count=8" in out
    assert "count=4" not in out and "--foo=1" in out and "--bar=2" in out
