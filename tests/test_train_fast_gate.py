"""Unit tests for the fast-numerics A/B quality gate (scripts/train_fast_ab.py).

The gate certifies recipe-level numerics relaxations against the BASELINE.md
0.1%-absolute dev-EER contract (reference best rule: src/train.py:484-518).
VERDICT r4 flagged the round-4 gate as weaker than its documentation; the
round-5 first cut then couldn't FAIL its own negative control (it landed
INCONCLUSIVE through the power clause). These tests pin the three-way rule:

  FAIL          |mean d| - 2*SE > 0.001          (regardless of power)
  INCONCLUSIVE  SE > 0.001 and not confidently outside
  PASS          SE <= 0.001 and |mean d| <= 0.001
"""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "train_fast_ab.py",
)


@pytest.fixture(scope="module")
def ab():
    spec = importlib.util.spec_from_file_location("train_fast_ab", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pass_tight_small_delta(ab):
    # powered (SE ~ 1e-4) and inside the contract
    assert ab.gate_verdict([0.0002, 0.0004, 0.0003, 0.0002, 0.0004]) == "PASS"


def test_fail_powered_over_contract(ab):
    # powered but mean delta 0.002 > 0.001
    assert ab.gate_verdict([0.0019, 0.0021, 0.0020, 0.0020, 0.0020]) == "FAIL"


def test_fail_underpowered_but_confident(ab):
    # the committed round-5 CONTROL row: paired deltas of lr-50x vs baseline
    # (results/train_fast_ab.md). SE 0.0016 > 0.001 (under-powered) yet
    # |mean| - 2*SE = 0.0066 — six sigma-equivalents outside the contract.
    # Low power must not shield a confidently-bad recipe.
    control = [0.0071, 0.0150, 0.0105, 0.0107, 0.0057]
    assert ab.gate_verdict(control) == "FAIL"


def test_inconclusive_underpowered_ambiguous(ab):
    # SE >> 0.001 and the mean is within 2*SE of the gate: no certification
    # either way
    assert ab.gate_verdict([-0.02, 0.021, -0.019, 0.018, 0.001]) == "INCONCLUSIVE"


def test_inconclusive_single_seed(ab):
    # one seed -> SE undefined (inf): can never certify PASS, and cannot be
    # confidently outside either
    assert ab.gate_verdict([0.0]) == "INCONCLUSIVE"


def test_boundary_exactly_at_contract_passes(ab):
    # |mean d| == GATE_ABS exactly, powered -> PASS (contract is inclusive)
    d = np.full(5, 0.001)
    assert ab.gate_verdict(d) == "PASS"
