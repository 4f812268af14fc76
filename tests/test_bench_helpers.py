"""Unit tests for bench.py's outage-hardening helpers (VERDICT r3 item 1a).

Only the host-side logic — the bench itself needs the real chip.
"""
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


class TestWaitForBackend:
    def test_explicit_zero_budget_disables_gate(self, monkeypatch):
        # budget_s=0 must mean "disabled" (documented), not "use the 1h
        # default" (the falsy `or` bug): no probe subprocess may run.
        monkeypatch.delenv("STORAGE_TPU_BENCH_INIT_WAIT_S", raising=False)

        def boom(*a, **k):  # pragma: no cover - must not be reached
            raise AssertionError("probe subprocess ran despite budget_s=0")

        monkeypatch.setattr("subprocess.run", boom)
        assert bench.wait_for_backend(budget_s=0) is True

    def test_env_zero_disables_gate(self, monkeypatch):
        monkeypatch.setenv("STORAGE_TPU_BENCH_INIT_WAIT_S", "0")

        def boom(*a, **k):  # pragma: no cover
            raise AssertionError("probe subprocess ran despite env 0")

        monkeypatch.setattr("subprocess.run", boom)
        assert bench.wait_for_backend() is True

    def test_env_overrides_argument(self, monkeypatch):
        monkeypatch.setenv("STORAGE_TPU_BENCH_INIT_WAIT_S", "0")
        monkeypatch.setattr(
            "subprocess.run",
            lambda *a, **k: (_ for _ in ()).throw(AssertionError("probed")),
        )
        assert bench.wait_for_backend(budget_s=3600) is True

    def test_budget_exhaustion_returns_false(self, monkeypatch):
        # A probe that always fails must exhaust a tiny budget and return
        # False without sleeping the full retry interval more than once.
        monkeypatch.delenv("STORAGE_TPU_BENCH_INIT_WAIT_S", raising=False)

        class FailedProc:
            returncode = 1
            stdout = ""
            stderr = "UNAVAILABLE: tunnel down"

        monkeypatch.setattr("subprocess.run", lambda *a, **k: FailedProc())
        slept = []
        monkeypatch.setattr("time.sleep", lambda s: slept.append(s))
        assert bench.wait_for_backend(budget_s=1.0, retry_sleep_s=5.0) is False
        assert slept == []  # remaining < retry_sleep_s -> no pointless sleep
