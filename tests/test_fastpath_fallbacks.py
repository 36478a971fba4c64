"""Fast-path fallback chain: fused -> split -> host retry -> eager.

VERDICT r3 #1: only fused failures were memoized, so every call re-paid
the failing split compile, and the eager last resort re-traced per call.
These tests force failures at each tier (monkeypatching the cached
program factories) and assert (a) results stay correct, (b) persistent
failures are memoized so the failing tier is attempted exactly once,
(c) transient failures are NOT memoized.
"""

import numpy as np
import pytest

from kvxopt_tpu import solvers
from kvxopt_tpu.solvers import coneprog as cp


@pytest.fixture(autouse=True)
def _clear_memos():
    cp._FUSED_BAD.clear()
    cp._SPLIT_BAD.clear()
    yield
    cp._FUSED_BAD.clear()
    cp._SPLIT_BAD.clear()


def _lp_args():
    c = np.array([-4., -5.])
    G = np.array([[2., 1.], [1., 2.], [-1., 0.], [0., -1.]])
    h = np.array([3., 3., 0., 0.])
    return c, G, h


def test_lp_split_fallback_memoizes_fused(monkeypatch):
    calls = {"fused": 0}
    real = cp._cached_lp_solver_full

    def failing(dims, kktsolver, o):
        calls["fused"] += 1
        raise RuntimeError("compile-helper SIGABRT (simulated)")

    monkeypatch.setattr(cp, "_cached_lp_solver_full", failing)
    c, G, h = _lp_args()
    for _ in range(3):
        sol = solvers.lp(c, G, h)
        assert sol["status"] == "optimal"
        np.testing.assert_allclose(
            np.asarray(sol["x"]).ravel(), [1.0, 1.0], atol=1e-6)
    assert calls["fused"] == 1, "persistent fused failure must be memoized"
    assert cp._FUSED_BAD and not cp._SPLIT_BAD
    monkeypatch.setattr(cp, "_cached_lp_solver_full", real)


def test_lp_transient_fused_failure_retries(monkeypatch):
    calls = {"fused": 0}

    def transient(dims, kktsolver, o):
        calls["fused"] += 1
        raise RuntimeError("RESOURCE_EXHAUSTED: out of memory (simulated)")

    monkeypatch.setattr(cp, "_cached_lp_solver_full", transient)
    c, G, h = _lp_args()
    for _ in range(2):
        sol = solvers.lp(c, G, h)
        assert sol["status"] == "optimal"
    assert calls["fused"] == 2, "transient failures must retry next call"
    assert not cp._FUSED_BAD


def test_lp_both_tiers_fail_still_solves(monkeypatch):
    def failing(*a):
        raise RuntimeError("compiler rejected program (simulated)")

    monkeypatch.setattr(cp, "_cached_lp_solver_full", failing)
    monkeypatch.setattr(cp, "_cached_lp_solver_split", failing)
    c, G, h = _lp_args()
    sol = solvers.lp(c, G, h)
    assert sol["status"] == "optimal"
    np.testing.assert_allclose(
        np.asarray(sol["x"]).ravel(), [1.0, 1.0], atol=1e-6)
    assert cp._FUSED_BAD and cp._SPLIT_BAD


def test_qp_split_fallback_memoizes_both(monkeypatch):
    calls = {"fused": 0, "split": 0}

    def failf(dims, kktsolver, o):
        calls["fused"] += 1
        raise RuntimeError("compiler rejected program (simulated)")

    def fails(dims, kktsolver, o):
        calls["split"] += 1
        raise RuntimeError("compiler rejected program (simulated)")

    monkeypatch.setattr(cp, "_cached_qp_solver_full", failf)
    monkeypatch.setattr(cp, "_cached_qp_solver_split", fails)
    P = np.eye(2)
    q = np.array([1., -1.])
    G = -np.eye(2)
    h = np.zeros(2)
    for _ in range(3):
        sol = solvers.qp(P, q, G, h)
        assert sol["status"] == "optimal"
        np.testing.assert_allclose(
            np.asarray(sol["x"]).ravel(), [0.0, 1.0], atol=1e-6)
    assert calls["fused"] == 1 and calls["split"] == 1
