"""bench.py harness behavior: flake retry + frozen-baseline protocol.

Reference timing semantics: the per-case time gate compares against a
measure-once oracle_time (reference scripts/run_benchmark.py:510-517);
bench.py must therefore never measure the CPU proxy live on a contended
box, and must survive one transient remote-backend flake per case.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


class _FlakyError(Exception):
    pass


# the retry logic keys on the exception type NAME (jax wraps backend
# errors in XlaRuntimeError/JaxRuntimeError)
_FlakyError.__name__ = "XlaRuntimeError"


class _FakeSolver:
    def __init__(self, failures, msg):
        self.failures = failures
        self.msg = msg
        self.calls = 0

    def solve(self, oc):
        self.calls += 1
        if self.calls <= self.failures:
            raise _FlakyError(self.msg)
        return "ok"


def test_retry_recovers_one_transient_flake(monkeypatch):
    monkeypatch.setattr(time, "sleep", lambda s: None)
    s = _FakeSolver(failures=1, msg="read body: response body closed")
    assert bench._solve_with_retry(s, {}, "case") == "ok"
    assert s.calls == 2


def test_retry_gives_up_after_budget(monkeypatch):
    monkeypatch.setattr(time, "sleep", lambda s: None)
    s = _FakeSolver(failures=5, msg="read body: response body closed")
    with pytest.raises(_FlakyError):
        bench._solve_with_retry(s, {}, "case")
    assert s.calls == 2  # one retry, then re-raise


def test_numerical_errors_not_retried(monkeypatch):
    monkeypatch.setattr(time, "sleep", lambda s: None)
    s = _FakeSolver(failures=5, msg="shape mismatch in dot_general")
    with pytest.raises(_FlakyError):
        bench._solve_with_retry(s, {}, "case")
    assert s.calls == 1  # deterministic error: no retry


def test_suite_orders_monsters_last():
    """Round-4 regression: the capture died (rc=124, parsed=null) because
    the monster cases ran FIRST and burned the driver's whole window. The
    hard ids must come AFTER every cheap per-type pick, in ascending
    expected cost."""
    suite = [c["id"] for c in bench._suite()]
    n_hard = sum(1 for i in bench._HARD_SUITE_IDS if i in suite)
    assert n_hard == len(bench._HARD_SUITE_IDS)
    assert suite[-n_hard:] == [i for i in bench._HARD_SUITE_IDS if i in suite]


def test_summary_line_partial_and_truncated():
    results = [
        {"id": "a", "type": "poisson", "t_tpu": 1.0, "t_cpu": 4.0,
         "error": 1e-4, "num_dofs": 100},
        {"id": "b", "type": "heat", "t_tpu": 2.0, "t_cpu": float("nan"),
         "error": 2e-4, "num_dofs": 100},
    ]
    import json

    partial = json.loads(bench._summary_line(results, 0.03, ["b"], [],
                                             partial=True))
    assert partial["partial"] is True
    assert partial["n_cases"] == 2
    # vs_baseline over the frozen subset only (case a): 4.0 / 1.0
    assert partial["vs_baseline"] == 4.0
    # all-case TPU mean
    assert partial["value"] == 1.5
    final = json.loads(bench._summary_line(results, 0.03, [], ["big_case"],
                                           partial=False))
    assert "partial" not in final
    assert final["truncated"] == ["big_case"]
    empty = json.loads(bench._summary_line([], None, [], [], partial=True))
    assert empty["value"] is None


def test_all_bench_suite_cases_are_frozen():
    """Every case bench.py would run must have a frozen CPU baseline;
    otherwise the official record silently loses its vs_baseline signal."""
    frozen = bench._frozen_proxy_times()
    suite = bench._suite()
    missing = [c["id"] for c in suite if c["id"] not in frozen]
    assert not missing, f"bench-suite cases without frozen CPU baseline: {missing}"
