"""Pallas fused backward-update parity tests (interpreter mode on CPU).

backward_scan_pallas must reproduce the XLA backward_scan: same regression
statistics and (modulo f32 reduction-order noise in the carried sim-mean,
which can flip near-tied decisions on a handful of sims) the same value
surface.
"""
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from storage_tpu import CmdtyStorage
from storage_tpu.compile import build_valuation_context
from storage_tpu.engines.lsmc import (
    backward_scan,
    backward_scan_pallas,
    device_inputs,
)
from storage_tpu.models.multi_factor import build_sim_coefficients
from storage_tpu.models.simulation import simulate_factor_paths
from storage_tpu.ops.pallas_backward import pick_backward_block
from storage_tpu.ops.regression import basis_spec
from storage_tpu.utils.basis import parse_basis_functions


@pytest.fixture(scope="module", params=["plain", "extras"])
def scenario(request):
    storage = CmdtyStorage(
        "D", "2021-02-01", "2021-02-21",
        injection_cost=0.3, withdrawal_cost=0.4,
        min_inventory=0.0, max_inventory=500.0,
        max_injection_rate=50.0, max_withdrawal_rate=60.0,
        cmdty_consumed_inject=0.01, inventory_loss=0.001, inventory_cost=0.02,
        terminal_storage_npv=lambda p, i: 0.9 * p * i,
    )
    idx = pd.period_range("2021-01-15", "2021-02-21", freq="D")
    fwd = pd.Series(20.0 + 3.0 * np.sin(np.arange(len(idx)) / 3.0), index=idx)
    rates = pd.Series(0.05, index=pd.period_range("2021-01-15", "2021-06-01", freq="D"))
    ctx = build_valuation_context(storage, "2021-01-15", 200.0, fwd, rates, None,
                                  num_grid_points=24)
    sim_periods = list(ctx.periods)
    coeffs_sim = build_sim_coefficients(
        [(4.0, pd.Series(0.6, index=idx))], np.eye(1), ctx.val_period, fwd, sim_periods
    )
    spec = basis_spec(parse_basis_functions("1 + x0 + x0**2"), 1)
    dev = device_inputs(ctx, jnp.float32)
    sim_vols = jnp.asarray(coeffs_sim.vols, jnp.float32)
    sim_drift = jnp.asarray(coeffs_sim.log_fwd_drift, jnp.float32)
    reg = simulate_factor_paths(coeffs_sim, 200, seed=5)  # 200: pads to 256
    extras = 1 if request.param == "extras" else 0
    return ctx, dev, spec, sim_vols, sim_drift, reg, extras


def run_backward(scenario, use_pallas, block_sims=None, reg=None, mesh=None):
    ctx, dev, spec, sim_vols, sim_drift, reg_s, extras = scenario
    reg = reg_s if reg is None else reg
    n = ctx.n_steps
    S = reg.shape[-1]
    G = ctx.num_grid_points
    m = reg.shape[0] - 1
    end_spots = jnp.exp(sim_drift[-1] + sim_vols[-1] @ reg[-1])
    v_end = jnp.broadcast_to(0.9 * end_spots[:, None] * dev.grids[n][None, :], (S, G))
    args = (
        v_end, reg[:m], sim_vols[:m], sim_drift[:m],
        dev.grids[:n], dev.space_lo[1 : n + 1], dev.space_hi[1 : n + 1],
        dev.pillars, dev.loss, dev.inject_cost, dev.withdraw_cost,
        dev.cons_inject, dev.cons_withdraw, dev.inv_cost_rate,
        dev.df_settle, dev.df_start,
    )
    kw = dict(spec=spec, interp_kind=ctx.interp_kind, num_grid_points=G,
              extra_decisions=extras)
    if use_pallas:
        return backward_scan_pallas(
            *args, block_sims=block_sims or pick_backward_block(S, G),
            interpret=True, mesh=mesh, **kw
        )
    return backward_scan(*args, **kw)


def _sanitize_kernel_gates(monkeypatch):
    """The kernel-variant A/B tests compute their baseline FIRST: a gate env
    var pre-existing in the developer's/CI shell (or a compile cache traced
    under one) would make baseline == variant and the test vacuous.  Sub-tiles
    are PINNED to the single-tile baseline (env unset now means the adaptive
    VMEM-bounded default, which is multi-tile at these shapes — each A/B leg
    sets the count it is testing explicitly)."""
    import jax

    monkeypatch.delenv("STORAGE_TPU_FOLD_AFFINE", raising=False)
    monkeypatch.setenv("STORAGE_TPU_BWD_SUBTILES", "1")
    jax.clear_caches()


class TestBackwardKernelParity:
    def test_matches_xla_backward(self, scenario):
        v_x, cf_x, mu_x, sd_x, vb_x = run_backward(scenario, use_pallas=False)
        v_p, cf_p, mu_p, sd_p, vb_p = run_backward(scenario, use_pallas=True)
        # Regression statistics depend only on the factor paths: equal to
        # f32 last-bit reduction noise (the kernel's masked/padded block sums
        # vs XLA's column means; the atol floor covers near-zero means where
        # a 1-ulp difference is a large relative one).
        np.testing.assert_allclose(
            np.asarray(mu_p), np.asarray(mu_x), rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(sd_p), np.asarray(sd_x), rtol=1e-6, atol=1e-7
        )
        # vbar: the two paths fit slightly different regressions (exact XLA
        # normal equations vs kernel partials, coeff q99.5 diff ~1.5e-3),
        # whose near-tie policy flips move a handful of sims' REALISED values
        # by their actual-value gaps — ~1e-3 relative on the sim-mean at 200
        # sims.  The surfaces themselves agree to ~4e-6 of scale (below).
        np.testing.assert_allclose(np.asarray(vb_p), np.asarray(vb_x),
                                   rtol=1e-5, atol=6.0)
        scale = np.abs(np.asarray(v_x)).max()
        # Coefficients: the two regression formulations (exact XLA normal
        # equations vs kernel partials re-standardized in closed form) agree
        # to ~2e-3 of the largest coefficient, dominated by which near-tie
        # sims each fit's policy realises — bound the distribution, with a
        # loose cap on the worst element.
        cf_scale = np.abs(np.asarray(cf_x)).max()
        cf_rel = np.abs(np.asarray(cf_p) - np.asarray(cf_x)) / cf_scale
        assert np.quantile(cf_rel, 0.995) < 5e-3
        assert cf_rel.max() < 2e-2
        # Value surface: sim-aggregate tight; elementwise allow a tail of
        # near-tie decision flips from reduction-order noise.
        np.testing.assert_allclose(
            np.asarray(v_p).mean(axis=0), np.asarray(v_x).mean(axis=0),
            rtol=2e-4, atol=1e-4 * scale,
        )
        rel = np.abs(np.asarray(v_p) - np.asarray(v_x)) / scale
        assert np.quantile(rel, 0.995) < 1e-4
        assert rel.max() < 0.02

    def test_fold_affine_matches_broadcast_kernel(self, scenario, monkeypatch):
        """The fold-affine kernel (affine economics folded into the bf16
        MXU passes, sourced from the exact-f32 cwa columns — the PRODUCTION
        default since the Aug-18 hardware measurement) must track the
        broadcast kernel (``STORAGE_TPU_FOLD_AFFINE=0``): the fitted totals
        that drive every argmax are bit-identical, so differences are pure
        actual-value arithmetic (3-term colB / 2-term colB1 splits) plus
        downstream regression feedback.  Measured vs an f64 golden at 4096
        sims the fold is the MORE accurate leg (NPV rel 2.0e-5 interpret /
        5.5e-5 hardware vs broadcast 6.2e-5 / 7.3e-5)."""
        import jax

        _sanitize_kernel_gates(monkeypatch)

        monkeypatch.setenv("STORAGE_TPU_FOLD_AFFINE", "0")
        jax.clear_caches()  # the env gate is read at trace time
        v_p, cf_p, mu_p, sd_p, vb_p = run_backward(scenario, use_pallas=True)
        monkeypatch.setenv("STORAGE_TPU_FOLD_AFFINE", "1")
        jax.clear_caches()
        v_f, cf_f, mu_f, sd_f, vb_f = run_backward(scenario, use_pallas=True)
        jax.clear_caches()
        np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_p), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sd_f), np.asarray(sd_p), rtol=1e-6)
        scale = np.abs(np.asarray(v_p)).max()
        rel = np.abs(np.asarray(v_f) - np.asarray(v_p)) / scale
        assert np.quantile(rel, 0.995) < 1e-4
        assert rel.max() < 0.02  # near-tie flip tail, same cap as vs XLA
        vb_rel = np.abs(np.asarray(vb_f) - np.asarray(vb_p)) / scale
        assert vb_rel.max() < 1e-3


class TestSubTiles:
    """STORAGE_TPU_BWD_SUBTILES=N widens the kernel's VMEM block to N compute
    tiles (dispatch-overhead amortisation, ROUND2_NOTES ~2.2 us/block floor).

    Arithmetic identity: (block_sims=128, sub_tiles=2) performs the SAME
    per-sim ops as (block_sims=128, 2 grid blocks) and sums the two tiles'
    regression partials in the same order the baseline's cross-block sum
    does — so the two configurations must agree to float noise, not just
    statistically.
    """

    def test_two_sub_tiles_match_two_blocks(self, scenario, monkeypatch):
        import jax

        _sanitize_kernel_gates(monkeypatch)

        v_b, cf_b, mu_b, sd_b, vb_b = run_backward(
            scenario, use_pallas=True, block_sims=128)
        monkeypatch.setenv("STORAGE_TPU_BWD_SUBTILES", "2")
        jax.clear_caches()  # the env gate is read at trace time
        v_s, cf_s, mu_s, sd_s, vb_s = run_backward(
            scenario, use_pallas=True, block_sims=128)
        jax.clear_caches()
        np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_b),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(sd_s), np.asarray(sd_b),
                                   rtol=1e-6, atol=1e-7)
        cf_scale = np.abs(np.asarray(cf_b)).max()
        assert np.abs(np.asarray(cf_s) - np.asarray(cf_b)).max() < 1e-5 * cf_scale
        scale = np.abs(np.asarray(v_b)).max()
        assert np.abs(np.asarray(v_s) - np.asarray(v_b)).max() < 1e-5 * scale
        np.testing.assert_allclose(np.asarray(vb_s), np.asarray(vb_b),
                                   rtol=1e-5, atol=1e-4 * scale)

    def test_sub_tiles_compose_with_fold_affine(self, scenario, monkeypatch):
        """The two experimental gates are benched COMBINED (fold + sub-tiles);
        sub-tiling must stay a float-noise identity when the fold variant is
        the one being tiled."""
        import jax

        _sanitize_kernel_gates(monkeypatch)

        monkeypatch.setenv("STORAGE_TPU_FOLD_AFFINE", "1")
        jax.clear_caches()
        v_b, cf_b, mu_b, sd_b, vb_b = run_backward(
            scenario, use_pallas=True, block_sims=128)
        monkeypatch.setenv("STORAGE_TPU_BWD_SUBTILES", "2")
        jax.clear_caches()
        v_s, cf_s, mu_s, sd_s, vb_s = run_backward(
            scenario, use_pallas=True, block_sims=128)
        jax.clear_caches()
        np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_b),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(sd_s), np.asarray(sd_b),
                                   rtol=1e-6, atol=1e-7)
        cf_scale = np.abs(np.asarray(cf_b)).max()
        assert np.abs(np.asarray(cf_s) - np.asarray(cf_b)).max() < 1e-5 * cf_scale
        scale = np.abs(np.asarray(v_b)).max()
        assert np.abs(np.asarray(v_s) - np.asarray(v_b)).max() < 1e-5 * scale

    def test_sub_tiles_under_paths_mesh(self, scenario, monkeypatch):
        """The pod-scale composition: under a paths mesh the per-SHARD kernel
        wrapper does the clamp + span padding (the scan carry stays unpadded).
        On a 2-device mesh with 200 local sims and block 128 the shard genuinely
        runs one 2-tile span; the result must match the default kernel to float
        noise (same 128-lane groups, same pairwise partial sums, same psum)."""
        import jax

        _sanitize_kernel_gates(monkeypatch)

        from storage_tpu.parallel.mesh import paths_mesh

        reg2 = jnp.concatenate([scenario[5], scenario[5]], axis=-1)  # 400 sims
        mesh = paths_mesh(jax.devices()[:2])
        v_b, cf_b, mu_b, sd_b, vb_b = run_backward(
            scenario, use_pallas=True, block_sims=128, reg=reg2, mesh=mesh)
        monkeypatch.setenv("STORAGE_TPU_BWD_SUBTILES", "2")
        jax.clear_caches()
        v_s, cf_s, mu_s, sd_s, vb_s = run_backward(
            scenario, use_pallas=True, block_sims=128, reg=reg2, mesh=mesh)
        jax.clear_caches()
        np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_b),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(sd_s), np.asarray(sd_b),
                                   rtol=1e-6, atol=1e-7)
        cf_scale = np.abs(np.asarray(cf_b)).max()
        assert np.abs(np.asarray(cf_s) - np.asarray(cf_b)).max() < 1e-5 * cf_scale
        scale = np.abs(np.asarray(v_b)).max()
        assert np.abs(np.asarray(v_s) - np.asarray(v_b)).max() < 1e-5 * scale

    def test_sub_tiles_clamped_for_small_path_counts(self, scenario,
                                                     monkeypatch):
        """At S <= block_sims the clamp must keep the span at one tile (no
        dead-lane inflation) and reproduce the production result exactly."""
        import jax

        _sanitize_kernel_gates(monkeypatch)

        v_b, cf_b, *_ = run_backward(scenario, use_pallas=True, block_sims=256)
        monkeypatch.setenv("STORAGE_TPU_BWD_SUBTILES", "4")
        jax.clear_caches()
        v_s, cf_s, *_ = run_backward(scenario, use_pallas=True, block_sims=256)
        jax.clear_caches()
        np.testing.assert_array_equal(np.asarray(v_s), np.asarray(v_b))
        np.testing.assert_array_equal(np.asarray(cf_s), np.asarray(cf_b))


class TestAssembleRegression:
    """Direct check of the closed-form affine re-standardization: the exact
    standardized normal equations must be recoverable from approx-standardized
    raw partials (ones row carrying column sums), including the constant-
    column pass-through and the rank-one target re-centring."""

    @pytest.mark.parametrize("const_col", [False, True])
    def test_matches_direct_normal_equations(self, const_col):
        from storage_tpu.ops.pallas_backward import assemble_regression
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        S, B, G = 500, 4, 7
        X = rng.standard_normal((S, B)) * [1.5, 0.2, 3.0, 0.8] + [2.0, -1.0, 10.0, 0.0]
        if const_col:
            # Exactly f32-representable constant: mean/std are then exact
            # and BOTH standardizations flag it (non-representable constants
            # like 4.2 leave standardize_columns with sd ~ 1e-6 from f32
            # mean-accumulation jitter — a pre-existing quirk the partials
            # path actually handles more robustly via its relative
            # variance threshold).
            X[:, 1] = 2.0
        V = rng.standard_normal((S, G)) * 50.0 + 1000.0
        vbar_new = V.mean(axis=0)
        c_prev = vbar_new + rng.standard_normal(G)  # arbitrary stale centring

        # Approximate standardization with DIFFERENT (shifted) stats, as the
        # kernel uses the adjacent period's moments.
        m_a = X.mean(axis=0) + 0.1 * rng.standard_normal(B)
        s_a = X.std(axis=0) * (1.0 + 0.05 * rng.standard_normal(B))
        s_a = np.where(np.abs(s_a) < 1e-9, 1.0, s_a)
        Z1 = np.concatenate([(X - m_a) / s_a, np.ones((S, 1))], axis=1)
        graw = Z1.T @ Z1
        praw = Z1.T @ (V - c_prev)

        coeffs, mu, sd = assemble_regression(
            jnp.asarray(graw, jnp.float32), jnp.asarray(praw, jnp.float32),
            jnp.asarray(np.stack([m_a, s_a]), jnp.float32),
            jnp.asarray(vbar_new - c_prev, jnp.float32), S,
        )

        # Direct reference: standardize_columns + ridge normal equations.
        from storage_tpu.ops.regression import standardize_columns

        Xs_ref, mu_ref, sd_ref = standardize_columns(jnp.asarray(X, jnp.float32))
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sd), np.asarray(sd_ref), rtol=2e-4)
        Xs_ref = np.asarray(Xs_ref, np.float64)
        gram_ref = Xs_ref.T @ Xs_ref + 1e-6 * S * np.eye(B)
        rhs_ref = Xs_ref.T @ (V - vbar_new)
        coeffs_ref = np.linalg.solve(gram_ref, rhs_ref)
        scale = np.abs(coeffs_ref).max()
        np.testing.assert_allclose(
            np.asarray(coeffs), coeffs_ref, atol=5e-4 * scale, rtol=5e-4
        )

    def test_prev_constant_column_with_f32_accumulated_partials(self):
        """A column CONSTANT in the previous period standardized by the
        current period's (different) stats is a non-zero constant z.  With
        partials accumulated in f32 — the kernel's exact op — the
        cancellation floor of E[z^2] - zbar^2 is ~3e-5 relative at 4096 sims
        (f32 summation error, NOT the ~1e-7 of rounding one value), which the
        old 1e-5 threshold missed: sd came out ~1e-2..1e-4 instead of
        pass-through and the amplified column corrupted that period's
        coefficients ~10%.  Review finding, round 4."""
        import jax
        import jax.numpy as jnp

        from storage_tpu.ops.pallas_backward import assemble_regression

        rng = np.random.default_rng(11)
        S, B, G = 4096, 4, 5
        X = rng.standard_normal((S, B)) * [1.5, 0.2, 3.0, 0.8] + [2.0, -1.0, 10.0, 0.0]
        X[:, 1] = 1.0  # constant THIS (previous) period
        V = rng.standard_normal((S, G)) * 50.0 + 1000.0
        vbar_new = V.mean(axis=0)
        c_prev = vbar_new + rng.standard_normal(G)

        # Current-period stats: the column VARIES there (m=2, s=0.7), so z is
        # the non-zero constant (1 - 2) / 0.7 — the dangerous case.
        m_a = X.mean(axis=0) + 0.1 * rng.standard_normal(B)
        s_a = np.where(X.std(axis=0) < 1e-9, 1.0,
                       X.std(axis=0) * (1.0 + 0.05 * rng.standard_normal(B)))
        m_a[1], s_a[1] = 2.0, 0.7

        # Accumulate the partials with the kernel's exact op: f32 inputs,
        # f32-accumulating dot at HIGHEST precision.
        Z1 = np.concatenate([(X - m_a) / s_a, np.ones((S, 1))], axis=1)
        z32 = jnp.asarray(Z1, jnp.float32)
        v32 = jnp.asarray(V - c_prev, jnp.float32)
        dn = (((0,), (0,)), ((), ()))
        graw = jax.lax.dot_general(z32, z32, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        praw = jax.lax.dot_general(z32, v32, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

        coeffs, mu, sd = assemble_regression(
            graw, praw,
            jnp.asarray(np.stack([m_a, s_a]), jnp.float32),
            jnp.asarray(vbar_new - c_prev, jnp.float32), S,
        )

        # The constant column must pass through raw (mu=0, sd=1), as
        # standardize_columns does with exact data.
        assert float(mu[1]) == 0.0 and float(sd[1]) == 1.0

        Xs_ref = np.concatenate(
            [(X[:, :1] - X[:, :1].mean()) / X[:, :1].std(), X[:, 1:2],
             (X[:, 2:] - X[:, 2:].mean(axis=0)) / X[:, 2:].std(axis=0)],
            axis=1,
        )
        gram_ref = Xs_ref.T @ Xs_ref + 1e-6 * S * np.eye(B)
        rhs_ref = Xs_ref.T @ (V - vbar_new)
        coeffs_ref = np.linalg.solve(gram_ref, rhs_ref)
        scale = np.abs(coeffs_ref).max()
        np.testing.assert_allclose(
            np.asarray(coeffs), coeffs_ref, atol=2e-3 * scale, rtol=2e-3
        )


class TestPrepareDecisionMatrices:
    """XLA-side operand prep: the bf16 hi/lo splits must survive compilation.

    TPU builds run with --xla_allow_excess_precision, which licenses XLA to
    elide ``x - f32(bf16(x))`` rounding round-trips — collapsing the residual
    passes to zero and silently quantizing the ~1e5-magnitude affine columns
    to ONE bf16 pass (measured as a 22% NPV corruption on chip before the
    ``lax.reduce_precision`` fix).  This pins the reconstruction fidelity
    UNDER JIT, so any future elision regression fails here.
    """

    def test_affine_columns_reconstruct_under_jit(self, monkeypatch):
        import jax

        from storage_tpu.ops.pallas_backward import prepare_decision_matrices

        # Pin the non-split fit layout regardless of ambient experiment knobs.
        monkeypatch.setenv("STORAGE_TPU_FIT_PRECISION", "highest")

        D, G, B = 3, 7, 4
        rng = np.random.default_rng(0)
        cwa = jnp.asarray(
            rng.normal(scale=1e5, size=(D, G, B + 2)), jnp.float32
        )
        wdt = jnp.asarray(
            np.round(rng.uniform(size=(D, G, G)) * 128) / 128, jnp.float32
        )

        fit, act1, act2 = jax.jit(
            prepare_decision_matrices, static_argnums=(2, 3)
        )(cwa, wdt, B, True)
        np.testing.assert_array_equal(np.asarray(fit), np.asarray(cwa).reshape(D * G, B + 2))
        # m16 block is the exact bf16 image of the quantized weights.
        np.testing.assert_array_equal(
            np.asarray(act1[:, :G], np.float32), np.asarray(wdt).reshape(D * G, G)
        )
        np.testing.assert_array_equal(np.asarray(act1[:, :G]), np.asarray(act2[:, :G]))
        # colB: hi + md + lo three-term split reconstructs to ~f32 precision
        # (the lo pass would be all-zero if XLA elided the rounding).
        colB = np.asarray(cwa[:, :, B]).reshape(D * G)
        rec = (
            np.asarray(act1[:, G], np.float64)
            + np.asarray(act1[:, G + 1], np.float64)
            + np.asarray(act2[:, G], np.float64)
        )
        np.testing.assert_allclose(rec, colB, rtol=3e-7)
        assert np.abs(np.asarray(act2[:, G], np.float64)).max() > 0.0
        # colB1: two-term split to ~bf16^2 (~16-bit) relative fidelity.
        colB1 = np.asarray(cwa[:, :, B + 1]).reshape(D * G)
        rec1 = (
            np.asarray(act1[:, G + 2], np.float64)
            + np.asarray(act2[:, G + 2], np.float64)
        )
        np.testing.assert_allclose(rec1, colB1, rtol=5e-5)
        # The doubled colB1 columns (paired against spot hi AND lo rows in
        # the kernel RHS) are copies.
        np.testing.assert_array_equal(np.asarray(act1[:, G + 2]), np.asarray(act1[:, G + 3]))
        np.testing.assert_array_equal(np.asarray(act2[:, G + 2]), np.asarray(act2[:, G + 3]))

    def test_split3_fit_reconstructs_under_jit(self, monkeypatch):
        """The K-concatenated bf16 fit split (STORAGE_TPU_FIT_PRECISION=
        split3) must reconstruct the f32 tables to ~2^-16 relative UNDER JIT
        — the hi block rounds via lax.reduce_precision, so an
        excess-precision elision regression would zero the lo block and fail
        the fidelity assertion here."""
        import jax

        from storage_tpu.ops.pallas_backward import prepare_decision_matrices

        monkeypatch.setenv("STORAGE_TPU_FIT_PRECISION", "split3")

        # Distinct shapes from the layout test above: the env knob is read at
        # TRACE time and jax.jit's cache is keyed on shapes, not the env.
        D, G, B = 3, 8, 4
        rng = np.random.default_rng(2)
        cwa = jnp.asarray(
            rng.normal(scale=1e5, size=(D, G, B + 2)), jnp.float32
        )
        wdt = jnp.asarray(
            np.round(rng.uniform(size=(D, G, G)) * 128) / 128, jnp.float32
        )
        fit, _, _ = jax.jit(
            prepare_decision_matrices, static_argnums=(2, 3)
        )(cwa, wdt, B, True)
        K = B + 2
        assert fit.shape == (D * G, 3 * K) and fit.dtype == jnp.bfloat16
        f_hi = np.asarray(fit[:, :K], np.float64)
        f_lo = np.asarray(fit[:, K : 2 * K], np.float64)
        # Third block pairs the hi part against the kernel's X_lo rows.
        np.testing.assert_array_equal(
            np.asarray(fit[:, 2 * K :]), np.asarray(fit[:, :K])
        )
        ref = np.asarray(cwa, np.float64).reshape(D * G, K)
        np.testing.assert_allclose(f_hi + f_lo, ref, rtol=2e-5)
        # The lo block must carry real residual (elision would zero it).
        assert np.abs(f_lo).max() > 0.0

    def test_broadcast_mode_cols(self):
        import jax

        from storage_tpu.ops.pallas_backward import prepare_decision_matrices

        D, G, B = 3, 5, 2
        rng = np.random.default_rng(1)
        cwa = jnp.asarray(rng.normal(size=(D, G, B + 2)), jnp.float32)
        wdt = jnp.asarray(
            np.round(rng.uniform(size=(D, G, G)) * 128) / 128, jnp.float32
        )
        fit, m16, cols = jax.jit(
            prepare_decision_matrices, static_argnums=(2, 3)
        )(cwa, wdt, B, False)
        assert cols.shape == (D * G, 2) and cols.dtype == jnp.float32
        np.testing.assert_array_equal(
            np.asarray(cols[:, 0]), np.asarray(cwa[:, :, B]).reshape(D * G)
        )
        np.testing.assert_array_equal(
            np.asarray(cols[:, 1]), np.asarray(cwa[:, :, B + 1]).reshape(D * G)
        )
