"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax init.

This is the TPU answer to "test multi-chip without a cluster" (SURVEY.md §4f):
sharding/pjit tests run against 8 fake host devices, the same code path the
driver's ``dryrun_multichip`` validates.
"""

import os

# The TPU sitecustomize may have imported jax already (env JAX_PLATFORMS is
# read at import), so switch platform via jax.config — it works any time
# before first backend use. XLA_FLAGS is read at CPU client creation, which
# also hasn't happened yet.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
FIXTURE_DIR = pathlib.Path("/root/reference/yolo_v1/data")


@pytest.fixture(scope="session")
def goldens():
    """Load golden fixtures generated from the reference implementation
    (see tests/golden/generate_goldens.py)."""
    import json

    path = GOLDEN_DIR / "reference_goldens.json"
    if not path.exists():
        pytest.skip("golden fixtures not generated")
    with open(path) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def fixture_boxes():
    """The reference repo's 3-box test fixture labels (data/test.txt)."""
    rows = []
    with open(FIXTURE_DIR / "test.txt") as f:
        for line in f.read().splitlines():
            cls, cx, cy, w, h = map(float, line.split())
            rows.append([cx, cy, w, h, cls])
    return np.array(rows, dtype=np.float32)
