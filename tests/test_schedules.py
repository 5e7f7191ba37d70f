"""Schedule parity vs the executed reference callbacks
(ref train.py:126-135 lr_schedule, ref cosine_annealing.py)."""

import json
import pathlib

import numpy as np
import pytest

from keras_object_detection_tpu.config import ScheduleConfig
from keras_object_detection_tpu.train.schedules import (
    cosine_annealing_restarts_lrs,
    epoch_schedule,
    piecewise_warmup_lr,
)

GOLDEN = pathlib.Path(__file__).parent / "golden" / "schedule_goldens.json"


def test_piecewise_warmup_exact():
    # exact arithmetic from ref train.py:126-135
    assert piecewise_warmup_lr(0) == 0.001
    assert np.isclose(piecewise_warmup_lr(37), 0.001 + 0.009 * (37.0 / 75.0))
    assert np.isclose(piecewise_warmup_lr(74), 0.001 + 0.009 * (74.0 / 75.0))
    assert piecewise_warmup_lr(75) == 0.001
    assert piecewise_warmup_lr(104) == 0.001
    assert piecewise_warmup_lr(105) == 0.0001
    assert piecewise_warmup_lr(500) == 0.0001


def test_cosine_restarts_matches_reference_goldens():
    if not GOLDEN.exists():
        pytest.skip("schedule goldens not generated")
    for case in json.load(open(GOLDEN)):
        p = case["params"]
        got = cosine_annealing_restarts_lrs(
            p["num_epochs"], p["eta_max"], p["eta_min"], p["t_max"],
            p["t_mult"], p["decay"])
        np.testing.assert_allclose(got, case["lrs"], rtol=1e-6, atol=1e-12)


def test_cosine_modified_amplitude():
    # dips reach (3 - 1)/4 = half of eta_max, not eta_min (ref line 35)
    lrs = cosine_annealing_restarts_lrs(20, 0.001, 0.0, 10, 1, 1.0)
    assert np.isclose(min(lrs), 0.001 / 2, rtol=1e-6)
    assert np.isclose(max(lrs), 0.001, rtol=1e-6)


def test_epoch_schedule_kinds():
    assert np.allclose(
        epoch_schedule(ScheduleConfig(kind="constant", base_lr=0.5), 3), 0.5)
    pw = epoch_schedule(ScheduleConfig(kind="piecewise_warmup"), 200)
    assert pw[0] == 0.001 and pw[150] == 0.0001
    cr = epoch_schedule(ScheduleConfig(kind="cosine_restarts", base_lr=0.001), 30)
    assert len(cr) == 30 and cr[0] == 0.001
