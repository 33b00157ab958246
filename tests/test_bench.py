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


def test_all_bench_suite_cases_are_frozen():
    """Every case bench.py would run must have a frozen CPU baseline;
    otherwise the official record silently loses its vs_baseline signal."""
    frozen = bench._frozen_proxy_times()
    suite = bench._suite()
    missing = [c["id"] for c in suite if c["id"] not in frozen]
    assert not missing, f"bench-suite cases without frozen CPU baseline: {missing}"
