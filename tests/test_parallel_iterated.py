"""Parallel iterated smoothers (IEKS/IPLS, ops/parallel_iterated.py) and the
time-varying associative-scan substrate (ops/associative.py *_tv).

Oracles are sequential float64 numpy implementations written inline (same
pattern as tests/test_golden_parity.py): a time-varying KF/RTS and an IEKS
loop with the exact linearization conventions of the module under test.
"""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from bayesianfiltering_tpu.models import zoo
from bayesianfiltering_tpu.ops import (
    ParamsUKF,
    kalman_smoother,
    parallel_iterated_extended_smoother,
    parallel_iterated_sigma_point_smoother,
)
from bayesianfiltering_tpu.ops.associative import (
    parallel_kalman_filter_tv,
    parallel_kalman_smoother_tv,
)

UP = ParamsUKF(1.0, 0.0, 0.0, "cholesky")


def mild_sine_model():
    """1-D model that is genuinely mild for iterated smoothers: f' = 0.8 +
    0.1cos ∈ [0.7, 0.9] (globally contractive — a single attractor, so the
    rollout nominal cannot climb into a wrong basin) and h' = cos + 0.5 is
    informative over the state range. Unlike the quadratic emission, whose
    x̄=0 nominal is a degenerate IEKS fixed point (H = 2bx̄ = 0), and unlike
    a 0.9x + 0.2sin(x) drift, whose unstable origin (f'(0) = 1.1) makes the
    model bistable."""
    f = lambda x, qn, u: 0.8 * x + 0.1 * jnp.sin(x) + qn
    h = lambda x, rn, u: jnp.sin(x) + 0.5 * x + rn
    return zoo._bundle(1, 1, 1, 1, 0.5 * jnp.ones(1), 0.25 * jnp.eye(1), f,
                       0.05 * jnp.eye(1), h, 0.05 * jnp.eye(1))


# ---------------------------------------------------------------------------
# numpy float64 oracle: sequential time-varying KF + RTS (+ IEKS loop)
# ---------------------------------------------------------------------------


def np_tv_kf_rts(m0, P0, Fs, cs, Qs, Hs, ds, Rs, ys):
    """Sequential TV Kalman filter + RTS smoother, float64. Index t of
    Fs/cs/Qs is the transition INTO t (Fs[0] unused); t=0 conditions the
    prior directly (the module's convention)."""
    T = len(ys)
    fm, fP, pm_prev, pP_prev = [], [], [], []
    m, P = np.asarray(m0, np.float64), np.asarray(P0, np.float64)
    ll = 0.0
    for t in range(T):
        if t > 0:
            m = Fs[t] @ m + cs[t]
            P = Fs[t] @ P @ Fs[t].T + Qs[t]
        pm_prev.append(m)
        pP_prev.append(P)
        S = Hs[t] @ P @ Hs[t].T + Rs[t]
        resid = ys[t] - Hs[t] @ m - ds[t]
        ll += -0.5 * (len(resid) * np.log(2 * np.pi)
                      + np.linalg.slogdet(S)[1]
                      + resid @ np.linalg.solve(S, resid))
        K = np.linalg.solve(S, Hs[t] @ P).T
        m = m + K @ resid
        P = P - K @ S @ K.T
        fm.append(m)
        fP.append(P)
    sm, sP = [fm[-1]], [fP[-1]]
    for t in range(T - 2, -1, -1):
        Pp = Fs[t + 1] @ fP[t] @ Fs[t + 1].T + Qs[t + 1]
        mp = Fs[t + 1] @ fm[t] + cs[t + 1]
        G = np.linalg.solve(Pp, Fs[t + 1] @ fP[t]).T
        sm.insert(0, fm[t] + G @ (sm[0] - mp))
        sP.insert(0, fP[t] + G @ (sP[0] - Pp) @ G.T)
    return (np.array(fm), np.array(fP), np.array(sm), np.array(sP), ll)


def np_ieks_quadratic(a, b, q, r, ys, num_iter, nominal):
    """Sequential IEKS on the quadratic-measurement model (zoo), float64,
    with the module's linearization conventions (emission linearized at
    nominal[t], noise through exact F_q/H_r products)."""
    T = len(ys)
    m0, P0 = np.zeros(1), np.eye(1)
    Fs = np.tile(a * np.eye(1), (T, 1, 1))
    cs = np.zeros((T, 1))
    Qs = np.tile(q * np.eye(1), (T, 1, 1))
    Rs = np.tile(r * np.eye(1), (T, 1, 1))
    nom = np.asarray(nominal, np.float64)
    for _ in range(num_iter + 1):
        Hs = 2.0 * b * nom[:, None, :]
        ds = b * nom**2 - (Hs @ nom[:, :, None])[:, :, 0]
        fm, fP, sm, sP, ll = np_tv_kf_rts(m0, P0, Fs, cs, Qs, Hs, ds, Rs, ys)
        nom = sm
    return fm, sm, ll


# ---------------------------------------------------------------------------
# time-varying parallel substrate
# ---------------------------------------------------------------------------


class TestTimeVaryingParallel:
    def _random_tv(self, T=40, dx=3, dy=2, seed=0):
        rng = np.random.default_rng(seed)
        Fs = 0.7 * np.tile(np.eye(dx), (T, 1, 1)) + 0.1 * rng.normal(
            size=(T, dx, dx))
        cs = 0.1 * rng.normal(size=(T, dx))
        mats = rng.normal(size=(T, dx, dx))
        Qs = 0.5 * np.einsum("tij,tkj->tik", mats, mats) + np.eye(dx)
        Hs = rng.normal(size=(T, dy, dx))
        ds = 0.1 * rng.normal(size=(T, dy))
        em = rng.normal(size=(T, dy, dy))
        Rs = 0.5 * np.einsum("tij,tkj->tik", em, em) + np.eye(dy)
        ys = rng.normal(size=(T, dy))
        m0 = rng.normal(size=(dx,))
        P0 = np.eye(dx)
        return m0, P0, Fs, cs, Qs, Hs, ds, Rs, ys

    def test_tv_filter_matches_numpy_oracle(self):
        args = self._random_tv()
        fm, fP, sm, sP, ll = np_tv_kf_rts(*args)
        jargs = [jnp.asarray(a, jnp.float32) for a in args]
        post = parallel_kalman_filter_tv(*jargs)
        np.testing.assert_allclose(post.filtered_means, fm,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(post.filtered_covariances, fP,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(float(post.marginal_loglik), ll,
                                   rtol=1e-3)

    def test_tv_filter_rank_deficient_q(self):
        """Singular per-step Q (rank dq < dx — the BOT family's effective
        F_q Q F_qᵀ) must not break the Woodbury combine: its C1 elements
        are singular, and the guarded Cholesky used to zero them (round-3
        bug). Oracle = float64 sequential TV KF."""
        T, dx, dy = 30, 4, 2
        rng = np.random.default_rng(3)
        G = rng.normal(size=(dx, 2))          # rank-2 noise loading
        Qs = np.tile(0.1 * G @ G.T, (T, 1, 1))
        Fs = np.tile(np.eye(dx) * 0.9, (T, 1, 1))
        cs = np.zeros((T, dx))
        Hs = np.tile(rng.normal(size=(dy, dx)), (T, 1, 1))
        ds = np.zeros((T, dy))
        # R=1e-2 keeps the test about SINGULAR C1, not f32 conditioning
        # (at R=1e-4 with O(1) random H even the native-solve associative
        # form drifts ~0.3 from the float64 oracle; the realistic stiff
        # case is covered by test_ieks_beats_erts_on_stiff_bot)
        Rs = np.tile(1e-2 * np.eye(dy), (T, 1, 1))
        ys = rng.normal(size=(T, dy))
        m0, P0 = np.zeros(dx), np.eye(dx)
        fm, fP, sm, sP, ll = np_tv_kf_rts(m0, P0, Fs, cs, Qs, Hs, ds, Rs, ys)
        jargs = [jnp.asarray(a, jnp.float32)
                 for a in (m0, P0, Fs, cs, Qs, Hs, ds, Rs, ys)]
        post = parallel_kalman_smoother_tv(*jargs)
        # f32 headroom: measured ~1.4e-3/4.2e-3 vs the float64 oracle
        # (native solve: 4.4e-2); the round-3 bug produced O(0.2) garbage
        np.testing.assert_allclose(post.filtered_means, fm,
                                   rtol=1e-2, atol=1e-2)
        np.testing.assert_allclose(post.smoothed_means, sm,
                                   rtol=2e-2, atol=2e-2)

    def test_tv_smoother_matches_numpy_oracle(self):
        args = self._random_tv(seed=1)
        _, _, sm, sP, _ = np_tv_kf_rts(*args)
        jargs = [jnp.asarray(a, jnp.float32) for a in args]
        post = parallel_kalman_smoother_tv(*jargs)
        np.testing.assert_allclose(post.smoothed_means, sm,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(post.smoothed_covariances, sP,
                                   rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# IEKS / IPLS
# ---------------------------------------------------------------------------


class TestParallelIEKS:
    def test_linear_model_exact_after_one_iteration(self):
        lg = zoo.linear_gaussian_lgssm(3, 2)
        model, params, _ = zoo.linear_gaussian(3, 2)
        em = jax.jit(lambda k: model.sample(params, k, 60)[1])(jr.PRNGKey(0))
        exact = kalman_smoother(lg, em)
        post, aux = parallel_iterated_extended_smoother(params, em,
                                                        num_iter=2)
        np.testing.assert_allclose(post.smoothed_means, exact.smoothed_means,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(post.marginal_loglik),
                                   float(exact.marginal_loglik), rtol=1e-4)
        # linearizing a linear model is exact -> the 2nd iteration is a
        # fixed point already
        assert float(aux.step_norms[1]) < 1e-5

    def test_matches_sequential_ieks_oracle(self):
        a, b, q, r = 0.8, 0.1, 1.0, 1.0
        model, params, _ = zoo.quadratic_measurement(a, b, q, r)
        em = jax.jit(lambda k: model.sample(params, k, 50)[1])(jr.PRNGKey(3))
        num_iter = 4
        # nonzero nominal init: the all-zero rollout is a degenerate fixed
        # point of the quadratic emission (H = 2bx̄ = 0)
        nominal = np.full((50, 1), 1.0)
        fm, sm, ll = np_ieks_quadratic(a, b, q, r, np.asarray(em, np.float64),
                                       num_iter, nominal)
        post, aux = parallel_iterated_extended_smoother(
            params, em, num_iter=num_iter, nominal=jnp.asarray(nominal))
        np.testing.assert_allclose(post.smoothed_means, sm,
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(post.filtered_means, fm,
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(float(post.marginal_loglik), ll, rtol=1e-3)

    def test_iterations_contract(self):
        model, params, _ = mild_sine_model()
        em = jax.jit(lambda k: model.sample(params, k, 80)[1])(jr.PRNGKey(5))
        post, aux = parallel_iterated_extended_smoother(params, em,
                                                        num_iter=6)
        norms = np.asarray(aux.step_norms)
        assert np.all(np.isfinite(norms))
        assert norms[-1] < norms[0]
        assert bool(jnp.all(jnp.isfinite(post.smoothed_means)))

    def test_input_alignment_exact_on_linear_model(self):
        """f = a·x + b·u_t is linear, so the IEKS is exact in one pass —
        and must match a float64 TV-KF oracle built with the generative
        convention (transition INTO t driven by u_t). Pins the input
        indexing (the filters' round-3 predict-alignment bug class)."""
        from bayesianfiltering_tpu.models.params import ParamsNLSSM

        a, bu, q, r = 0.7, 0.9, 0.4, 0.1
        T = 30
        rng = np.random.default_rng(7)
        u = jnp.asarray(rng.normal(size=(T, 1)), jnp.float32)
        params = ParamsNLSSM(
            initial_mean=jnp.zeros(1),
            initial_covariance=jnp.eye(1),
            dynamics_function=lambda x, qn, uu: a * x + bu * uu + qn,
            dynamics_noise_bias=jnp.zeros(1),
            dynamics_noise_covariance=q * jnp.eye(1),
            emission_function=lambda x, rn, uu: x + rn,
            emission_noise_bias=jnp.zeros(1),
            emission_noise_covariance=r * jnp.eye(1),
        )
        from bayesianfiltering_tpu.models.nonlinear import NonlinearSSM

        model = NonlinearSSM(1, 1, 1, 1)
        _, em = model.sample(params, jr.PRNGKey(4), T, inputs=u)

        un = np.asarray(u, np.float64)
        Fs = np.tile(a * np.eye(1), (T, 1, 1))
        cs = bu * un                       # c_t drives the transition INTO t
        Qs = np.tile(q * np.eye(1), (T, 1, 1))
        Hs = np.tile(np.eye(1), (T, 1, 1))
        ds = np.zeros((T, 1))
        Rs = np.tile(r * np.eye(1), (T, 1, 1))
        _, _, sm, _, ll = np_tv_kf_rts(np.zeros(1), np.eye(1), Fs, cs, Qs,
                                       Hs, ds, Rs, np.asarray(em, np.float64))
        post, _ = parallel_iterated_extended_smoother(params, em,
                                                      num_iter=1, inputs=u)
        np.testing.assert_allclose(post.smoothed_means, sm,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(post.marginal_loglik), ll, rtol=1e-4)

    def test_nominal_seed_modes(self):
        model, params, _ = mild_sine_model()
        em = jax.jit(lambda k: model.sample(params, k, 30)[1])(jr.PRNGKey(8))
        p_roll, _ = parallel_iterated_extended_smoother(
            params, em, num_iter=4, nominal="rollout")
        p_filt, _ = parallel_iterated_extended_smoother(
            params, em, num_iter=4, nominal="filter")
        # both converge to the same fixed point on a contractive model
        np.testing.assert_allclose(p_filt.smoothed_means,
                                   p_roll.smoothed_means,
                                   rtol=1e-3, atol=1e-3)
        with pytest.raises(ValueError, match="nominal seed"):
            parallel_iterated_extended_smoother(params, em, num_iter=1,
                                                nominal="bogus")

    def test_jits_and_accepts_nominal(self):
        model, params, _ = zoo.quadratic_measurement()
        em = jax.jit(lambda k: model.sample(params, k, 30)[1])(jr.PRNGKey(7))
        fn = jax.jit(lambda e, nom: parallel_iterated_extended_smoother(
            params, e, num_iter=3, nominal=nom)[0].smoothed_means)
        out = fn(em, jnp.zeros((30, 1)))
        assert out.shape == (30, 1)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestParallelIPLS:
    def test_linear_model_exact(self):
        lg = zoo.linear_gaussian_lgssm(3, 2)
        model, params, _ = zoo.linear_gaussian(3, 2)
        em = jax.jit(lambda k: model.sample(params, k, 40)[1])(jr.PRNGKey(1))
        exact = kalman_smoother(lg, em)
        post, _ = parallel_iterated_sigma_point_smoother(params, UP, em,
                                                         num_iter=2)
        np.testing.assert_allclose(post.smoothed_means, exact.smoothed_means,
                                   rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("additive", [False, True])
    def test_nonlinear_contracts_and_improves(self, additive):
        model, params, _ = mild_sine_model()
        states, em = jax.jit(lambda k: model.sample(params, k, 60))(
            jr.PRNGKey(9))
        post0, _ = parallel_iterated_sigma_point_smoother(
            params, UP, em, num_iter=0, additive=additive)
        post, aux = parallel_iterated_sigma_point_smoother(
            params, UP, em, num_iter=5, additive=additive)
        norms = np.asarray(aux.step_norms)
        assert np.all(np.isfinite(norms))
        # contracts to a fixed point
        assert norms[-1] < 0.01 and norms[-1] < norms[0]
        # relinearizing at the posterior should not hurt state recovery
        # (the surrogate marginal loglik is NOT the iteration's objective,
        # so RMSE against the true states is the honest metric here)
        rmse0 = float(jnp.sqrt(jnp.mean((post0.smoothed_means - states) ** 2)))
        rmse = float(jnp.sqrt(jnp.mean((post.smoothed_means - states) ** 2)))
        assert rmse <= rmse0 + 1e-3

    def test_ipls_close_to_ieks_on_mild_model(self):
        """On a mildly nonlinear model the SLR and Jacobian fixed points are
        close (they coincide as the posterior covariance -> 0)."""
        model, params, _ = mild_sine_model()
        em = jax.jit(lambda k: model.sample(params, k, 50)[1])(jr.PRNGKey(11))
        pe, _ = parallel_iterated_extended_smoother(params, em, num_iter=8)
        ps, _ = parallel_iterated_sigma_point_smoother(params, UP, em,
                                                       num_iter=8)
        np.testing.assert_allclose(ps.smoothed_means, pe.smoothed_means,
                                   rtol=0.15, atol=0.15)


class TestWrappedEmissions:
    def test_ieks_on_bearing_model_uses_residual(self):
        """The BOT range-bearing model carries emission_residual (angle
        wrap); the iterated smoother must route innovations through it
        (y_eff = ŷ + (y ⊖ ŷ)) — finite output, smoothing gain over the
        filter pass, on a moderately stiff configuration."""
        model, params, _ = zoo.range_bearing_tracking(r=2.5e-3)
        inputs = zoo.bot_experiment_inputs(60)
        st, em = model.sample(params, jr.PRNGKey(0), 60, inputs=inputs)
        post, aux = parallel_iterated_extended_smoother(
            params, em, num_iter=6, inputs=inputs)
        assert bool(jnp.all(jnp.isfinite(post.smoothed_means)))
        assert float(aux.step_norms[-1]) < 1.0  # converging, not 2-cycling
        rm_s = float(jnp.sqrt(jnp.mean((post.smoothed_means - st) ** 2)))
        rm_f = float(jnp.sqrt(jnp.mean((post.filtered_means - st) ** 2)))
        assert rm_s <= rm_f + 1e-6

    def test_ieks_beats_erts_on_stiff_bot(self):
        """Flagship regression for the rank-deficient-Q combine bug: on
        the BOT benchmark config (R=2.5e-5, dq=2 < dx=4 so the combine's
        C1 elements are SINGULAR), the IEKS must converge from the rollout
        and beat the single-pass sequential ERTS. With the round-3 bug
        (guarded Cholesky zeroing singular C1 → Minv = I) it stalled at
        ~25x worse RMSE."""
        import bayesianfiltering_tpu.inference as gf

        model, params, _ = zoo.range_bearing_tracking()
        inputs = zoo.bot_experiment_inputs(80)
        st, em = model.sample(params, jr.PRNGKey(0), 80, inputs=inputs)
        erts = gf.extended_rts_smoother(params, em, inputs=inputs)
        rm_erts = float(jnp.sqrt(jnp.mean((erts.smoothed_means - st) ** 2)))
        post, aux = parallel_iterated_extended_smoother(
            params, em, num_iter=8, inputs=inputs, damping=0.7)
        rm = float(jnp.sqrt(jnp.mean((post.smoothed_means - st) ** 2)))
        assert float(aux.step_norms[-1]) < 0.05       # converged
        assert rm <= rm_erts                          # 0.0044 vs 0.0101

    def test_recentered_ieks_survives_drifting_coordinates_t500(self):
        """Round-3 documented limitation, now closed: at T=500 the BOT
        state coordinates reach ~1e3 while covariances are ~1e-5, and the
        raw associative elements lose the increments to f32's 24-bit
        mantissa (non-recentered IEKS diverges, RMSE ~30). The deviation-
        space reparameterization (recenter=True, default) makes the
        parallel IEKS beat the sequential ERTS on this model class."""
        import bayesianfiltering_tpu.inference as gf

        model, params, _ = zoo.range_bearing_tracking()
        inputs = zoo.bot_experiment_inputs(500)
        st, em = model.sample(params, jr.PRNGKey(1), 500, inputs=inputs)
        erts = gf.extended_rts_smoother(params, em, inputs=inputs)
        rm_erts = float(jnp.sqrt(jnp.mean((erts.smoothed_means - st) ** 2)))
        post, aux = parallel_iterated_extended_smoother(
            params, em, num_iter=8, inputs=inputs, damping=0.7,
            nominal="filter")
        rm = float(jnp.sqrt(jnp.mean((post.smoothed_means - st) ** 2)))
        assert float(aux.step_norms[-1]) < 0.05      # converged (was ~130)
        assert rm < rm_erts                          # 0.095 vs 0.146

    def test_ipls_slr_residual_psd_projection_t500(self):
        """The SLR residual Ω = Φ⁺ − F P Fᵀ goes INDEFINITE in f32 at
        large coordinates (BOT T=500: min eig −1.4e-5 vs Q ~ 1e-5 —
        measured), which NaN'd the IPLS outright. With the matmul-only
        PSD projection + recentering it converges and beats the
        sequential URTS."""
        import bayesianfiltering_tpu.inference as gf
        from bayesianfiltering_tpu.ops.parallel_iterated import (
            parallel_iterated_sigma_point_smoother,
        )
        from bayesianfiltering_tpu.ops.ukf import ParamsUKF

        model, params, _ = zoo.range_bearing_tracking()
        inputs = zoo.bot_experiment_inputs(500)
        st, em = model.sample(params, jr.PRNGKey(1), 500, inputs=inputs)
        up = ParamsUKF(1.0, 0.0, 0.0)
        urts = gf.unscented_rts_smoother(params, up, em, inputs=inputs)
        rm_urts = float(jnp.sqrt(jnp.mean((urts.smoothed_means - st) ** 2)))
        post, aux = parallel_iterated_sigma_point_smoother(
            params, up, em, num_iter=8, inputs=inputs, damping=0.7,
            nominal="filter")
        rm = float(jnp.sqrt(jnp.mean((post.smoothed_means - st) ** 2)))
        assert bool(jnp.isfinite(post.smoothed_means).all())
        assert rm < rm_urts                    # 0.177 vs 0.220

    def test_ipls_filter_seed_matches_ieks_on_stiff_bot(self):
        """Round-3 weak #5 closed: with the broadcast-P0 nominal the
        IPLS's first SLR pass linearized over the wide prior spread, and
        at the BOT's stiff emission noise (R = 2.5e-5) the SLR residual
        Ω ≫ R drowned the measurements — the iteration converged to an
        inflated fixed point ~40× worse than the IEKS (median 0.3 vs
        0.008). nominal="filter" now seeds the nominal COVARIANCES from
        the EKF pass too; measured at T=100/Nsim=20 the IPLS table row is
        0.008 [0.006, 0.009], equal to the IEKS. Pin IPLS ≤ 2× IEKS."""
        import bayesianfiltering_tpu.inference as gf
        from bayesianfiltering_tpu.ops.parallel_iterated import (
            parallel_iterated_sigma_point_smoother,
        )
        from bayesianfiltering_tpu.ops.ukf import ParamsUKF

        model, params, _ = zoo.range_bearing_tracking()  # r = 2.5e-5
        inputs = zoo.bot_experiment_inputs(100)
        st, em = model.sample(params, jr.PRNGKey(0), 100, inputs=inputs)
        ieks, _ = parallel_iterated_extended_smoother(
            params, em, num_iter=8, inputs=inputs, nominal="filter",
            damping=0.7)
        ipls, aux = parallel_iterated_sigma_point_smoother(
            params, ParamsUKF(1.0, 0.0, 0.0), em, num_iter=8,
            inputs=inputs, nominal="filter")
        rm_ieks = float(jnp.sqrt(jnp.mean((ieks.smoothed_means - st) ** 2)))
        rm_ipls = float(jnp.sqrt(jnp.mean((ipls.smoothed_means - st) ** 2)))
        assert float(aux.step_norms[-1]) < 0.05           # converged
        assert rm_ipls <= 2.0 * rm_ieks, (rm_ipls, rm_ieks)

    def test_recenter_is_a_numerical_noop_when_well_scaled(self):
        _, p, _ = zoo.scalar_growth()
        ys = jr.normal(jr.PRNGKey(2), (200, 1))
        a, _ = parallel_iterated_extended_smoother(p, ys, num_iter=4,
                                                   recenter=True)
        b, _ = parallel_iterated_extended_smoother(p, ys, num_iter=4,
                                                   recenter=False)
        np.testing.assert_allclose(a.smoothed_means, b.smoothed_means,
                                   rtol=1e-3, atol=1e-3)

    def test_ieks_chunked_schedule_on_singular_q(self):
        """The chunked scan schedule must survive the same singular-C1
        regime (its identity-element padding/carry adds all-zero C1
        elements on top of the rank-2 ones)."""
        model, params, _ = zoo.range_bearing_tracking()
        inputs = zoo.bot_experiment_inputs(80)
        st, em = model.sample(params, jr.PRNGKey(0), 80, inputs=inputs)
        flat, _ = parallel_iterated_extended_smoother(
            params, em, num_iter=8, inputs=inputs, damping=0.7, chunk=None)
        chunked, aux = parallel_iterated_extended_smoother(
            params, em, num_iter=8, inputs=inputs, damping=0.7, chunk=16)
        assert float(aux.step_norms[-1]) < 0.05
        np.testing.assert_allclose(chunked.smoothed_means,
                                   flat.smoothed_means, rtol=1e-3, atol=1e-3)

    def test_lm_trust_region_converges_on_stiff_bot(self):
        model, params, _ = zoo.range_bearing_tracking()
        inputs = zoo.bot_experiment_inputs(60)
        st, em = model.sample(params, jr.PRNGKey(1), 60, inputs=inputs)
        post, aux = parallel_iterated_extended_smoother(
            params, em, num_iter=10, inputs=inputs, lm_lambda=100.0)
        assert bool(jnp.all(jnp.isfinite(post.smoothed_means)))
        assert float(aux.step_norms[-1]) < 0.05
        rm = float(jnp.sqrt(jnp.mean((post.smoothed_means - st) ** 2)))
        rm_f = float(jnp.sqrt(jnp.mean((post.filtered_means - st) ** 2)))
        assert rm <= rm_f + 1e-6


class TestTimeSharded:
    def test_ieks_runs_time_sharded(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        model, params, _ = zoo.quadratic_measurement()
        em = jax.jit(lambda k: model.sample(params, k, 64)[1])(jr.PRNGKey(2))
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("t",))
        sharded = jax.device_put(em, NamedSharding(mesh, P("t", None)))
        out = jax.jit(lambda e: parallel_iterated_extended_smoother(
            params, e, num_iter=3)[0].smoothed_means)(sharded)
        ref = parallel_iterated_extended_smoother(params, em,
                                                  num_iter=3)[0].smoothed_means
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
