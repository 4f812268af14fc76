"""Commit the brute-force DP verifier behind the README-example claim
(VERDICT round-1 'missing #4').

``BRUTE_FORCE_INTRINSIC_OPTIMUM = 40_990.8`` in test_readme_example.py was a
comment with no code behind it; this test recomputes it from the committed
independent float64 NumPy DP (benchmarks/brute_force_intrinsic.py) and locks
the engine's intrinsic against it from both sides.
"""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

from brute_force_intrinsic import brute_force_intrinsic_npv, readme_context
from test_readme_example import (
    BRUTE_FORCE_INTRINSIC_OPTIMUM,
    readme_market,
    readme_storage,
    settlement_rule,
)

from storage_tpu import intrinsic_value


class TestBruteForceVerifier:
    @pytest.fixture(scope="class")
    def ctx(self):
        return readme_context()

    def test_reproduces_pinned_optimum(self, ctx):
        npv = brute_force_intrinsic_npv(ctx, num_grid=1500, num_decisions=81)
        assert npv == pytest.approx(BRUTE_FORCE_INTRINSIC_OPTIMUM, abs=0.5)

    def test_engine_intrinsic_bracketed(self, ctx):
        fwd_curve, ir_curve = readme_market()
        engine = intrinsic_value(
            readme_storage(), "2021-04-25", 1500.0, fwd_curve, ir_curve,
            settlement_rule,
        )
        optimum = brute_force_intrinsic_npv(ctx, num_grid=3000, num_decisions=121)
        # The engine's realized NPV can exceed a finite-resolution DP value by
        # at most discretisation noise, and must be within 0.1% of it.
        assert engine.npv <= optimum * (1 + 1e-4)
        assert engine.npv == pytest.approx(optimum, rel=1e-3)

    def test_converges_from_below(self, ctx):
        coarse = brute_force_intrinsic_npv(ctx, num_grid=300, num_decisions=21)
        fine = brute_force_intrinsic_npv(ctx, num_grid=1500, num_decisions=81)
        finer = brute_force_intrinsic_npv(ctx, num_grid=3000, num_decisions=121)
        assert coarse <= fine * (1 + 1e-6)
        assert fine <= finer * (1 + 1e-6)
        assert finer - coarse <= 0.01 * abs(finer)  # already near-converged
