"""Unit tests for driver-level helpers (gating, error computation,
oracle cache round-trip)."""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "rb", Path(__file__).resolve().parents[1] / "scripts" / "run_benchmark.py"
)
rb = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(rb)


def test_gate_accuracy_first():
    oracle_info = {"error": 1e-4, "time": 1.0}
    eval_cfg = {"accuracy_tolerance": 10, "time_tolerance": 3}
    # pass both gates
    s, te, tt, fr = rb.gate(5e-4, 2.0, oracle_info, eval_cfg)
    assert s == "PASS" and te == pytest.approx(1e-3) and tt == pytest.approx(3.0)
    # accuracy fail dominates even when time also fails
    s, _, _, fr = rb.gate(1e-2, 99.0, oracle_info, eval_cfg)
    assert s == "FAIL" and fr == "ACCURACY_FAIL"
    # time fail
    s, _, _, fr = rb.gate(5e-4, 99.0, oracle_info, eval_cfg)
    assert s == "FAIL" and fr == "TIME_FAIL"
    # NaN error
    s, _, _, fr = rb.gate(float("nan"), 1.0, oracle_info, eval_cfg)
    assert fr == "INVALID_ERROR"


def test_gate_min_error_floor():
    # MIN_ERROR_THRESHOLD: tiny oracle errors floor the target at 1e-6
    oracle_info = {"error": 1e-12, "time": 1.0}
    eval_cfg = {"accuracy_tolerance": 10, "time_tolerance": 3}
    s, te, _, _ = rb.gate(5e-7, 1.0, oracle_info, eval_cfg)
    assert te == pytest.approx(1e-6)
    assert s == "PASS"


def test_gate_time_only():
    # 106 dataset cases gate on time only (no accuracy_tolerance)
    oracle_info = {"error": 0.0, "time": 1.0}
    eval_cfg = {"time_tolerance": 3}
    s, te, tt, _ = rb.gate(123.0, 2.0, oracle_info, eval_cfg)
    assert s == "PASS" and te is None


def test_compute_error_nan_masked(tmp_path):
    ref = np.random.default_rng(0).random((6, 6))
    ref[0, 0] = np.nan  # domain mask
    u = ref.copy()
    u[3, 3] += 0.1
    np.savez(tmp_path / "solution.npz", u=u)
    oracle_info = {
        "reference": [None if np.isnan(v) else float(v) for v in ref.ravel()],
        "reference_shape": [6, 6],
    }
    err = rb.compute_error(tmp_path, oracle_info)
    m = ~np.isnan(ref)
    expected = 0.1 / np.linalg.norm(ref[m])
    assert err == pytest.approx(expected)


def test_compute_error_strict_shape(tmp_path):
    np.savez(tmp_path / "solution.npz", u=np.zeros((5, 5)))
    oracle_info = {"reference": [0.0] * 36, "reference_shape": [6, 6]}
    assert rb.compute_error(tmp_path, oracle_info) is None


def test_oracle_cache_roundtrip(tmp_path):
    case = {
        "id": "cache_case",
        "oracle_config": {
            "pde": {"type": "poisson",
                    "manufactured_solution": {"u": "sin(pi*x)*sin(pi*y)"}},
            "domain": {"type": "unit_square"},
            "mesh": {"resolution": 12},
            "fem": {"degree": 1},
            "bc": {"dirichlet": {"on": "all", "value": "0"}},
            "output": {"grid": {"bbox": [0, 1, 0, 1], "nx": 8, "ny": 8}},
            "oracle_solver": {"ksp_type": "cg", "pc_type": "jacobi",
                              "rtol": 1e-9},
        },
    }
    info1 = rb.run_oracle(case, tmp_path)
    assert (tmp_path / ".oracle_cache" / "jax" / "cache_case.json").exists()
    info2 = rb.run_oracle(case, tmp_path)  # cache hit
    assert info2["reference"] == info1["reference"]
    assert info2["error"] == info1["error"]


def test_select_best_attempt_rules():
    assert rb._select_best_attempt(
        [{"status": "FAIL", "error": 0.9}, {"status": "PASS", "error": 0.1}]
    ) == 1
    assert rb._select_best_attempt(
        [{"status": "FAIL", "error": 0.2}, {"status": "FAIL", "error": 0.05}]
    ) == 1
    assert rb._select_best_attempt(
        [{"status": "LLM_ERROR"}, {"status": "LLM_ERROR"}]
    ) == 1
