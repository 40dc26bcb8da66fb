"""Tests for the Bezier mapping and the batched ADMM tube-QCQP solver.

Solution-quality parity is checked against a scipy SLSQP oracle (playing the
role of the reference's Mosek IPM): coefficients within tolerance, identical
feasibility verdicts (SURVEY.md section 7, stage 3).
"""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mav_tube_trajectory_generation_tpu as mtg
from mav_tube_trajectory_generation_tpu.ops import bezier, qmatrix
from mav_tube_trajectory_generation_tpu.solver import linear, qcqp
from mav_tube_trajectory_generation_tpu.solver import structure as sm

N = 10
H = N // 2


@contextlib.contextmanager
def _force_interpret(ak):
    """Monkeypatch BOTH fused kernel wrappers to interpret=True: makes the
    tests' interpret-mode intent explicit instead of relying on the
    wrappers' implicit CPU auto-fallback (ADVICE.md round 1)."""
    orig_f = ak.admm_stage_fused
    orig_ff = ak.admm_stage_fused_factored
    ak.admm_stage_fused = \
        lambda *a, **k: orig_f(*a, **{**k, "interpret": True})
    ak.admm_stage_fused_factored = \
        lambda *a, **k: orig_ff(*a, **{**k, "interpret": True})
    try:
        yield
    finally:
        ak.admm_stage_fused = orig_f
        ak.admm_stage_fused_factored = orig_ff


# ---------------------------------------------------------------------------
# Bezier mapping.
# ---------------------------------------------------------------------------

def test_control_points_reproduce_polynomial():
    # cp = B^{-1} d must give Bernstein control points of the same curve.
    rng = np.random.RandomState(0)
    t_seg = 2.3
    d_seg = jnp.asarray(rng.randn(1, N, 3))
    cp = np.asarray(bezier.control_points_from_endpoint_derivatives(
        d_seg, jnp.asarray([t_seg])))[0]                     # (N, 3)
    coeffs = np.asarray(qmatrix.coefficients_from_endpoint_derivatives(
        d_seg, jnp.asarray([t_seg])))[0]                     # (N, 3)
    taus = np.linspace(0, 1, 17)
    bern = bezier.bernstein_basis(N, taus)                   # (17, N)
    curve_bezier = bern @ cp                                 # (17, 3)
    for d in range(3):
        poly_vals = np.polynomial.Polynomial(coeffs[:, d])(taus * t_seg)
        np.testing.assert_allclose(curve_bezier[:, d], poly_vals,
                                   rtol=1e-7, atol=1e-8)


def test_control_point_endpoints():
    # First/last control point == start/end position.
    rng = np.random.RandomState(1)
    d_seg = jnp.asarray(rng.randn(1, N, 3))
    cp = np.asarray(bezier.control_points_from_endpoint_derivatives(
        d_seg, jnp.asarray([1.7])))[0]
    np.testing.assert_allclose(cp[0], np.asarray(d_seg)[0, 0], atol=1e-10)
    np.testing.assert_allclose(cp[-1], np.asarray(d_seg)[0, H], atol=1e-10)


# ---------------------------------------------------------------------------
# QCQP problem fixtures.
# ---------------------------------------------------------------------------

def make_problem(k=4, seed=3, spread=4.0):
    rng = np.random.RandomState(seed)
    waypoints = np.cumsum(rng.uniform(0.8, 1.5, size=(k + 1, 3)), axis=0) * \
        spread / k
    structure = sm.make_structure(sm.free_interior_mask(k + 1, N), 3, N)
    values = np.zeros((k + 1, H, 3))
    values[0, 0] = waypoints[0]
    values[-1, 0] = waypoints[-1]
    times = np.asarray(mtg.segment_times_nfabian(waypoints, 2.0, 2.0))
    d_fixed = np.asarray(linear.extract_fixed_values(
        structure, jnp.asarray(values)))
    return structure, jnp.asarray(d_fixed), jnp.asarray(times), \
        jnp.asarray(waypoints), values


def constraint_violation(structure, sol, waypoints, radii):
    """Max violation computed independently from control points."""
    d_seg = linear.segment_derivatives(structure, sol.d_fixed, sol.d_free)
    cp = np.asarray(bezier.control_points_from_endpoint_derivatives(
        d_seg, sol.times))                                  # (K, N, 3)
    waypoints = np.asarray(waypoints)
    radii = np.asarray(radii)
    k = structure.n_segments
    viol = -np.inf
    for seg in range(k):
        p0, p1 = waypoints[seg], waypoints[seg + 1]
        nvec = (p1 - p0) / np.linalg.norm(p1 - p0)
        if seg < k - 1:
            viol = max(viol, np.linalg.norm(cp[seg, N - 1] - p1)
                       - radii[seg, 1])
        r_prev = radii[seg - 1, 1] if seg > 0 else radii[0, 0]
        cap0 = p0 - nvec * r_prev
        cap1 = p1 + nvec * radii[seg, 1]
        for j in range(1, N - 1):
            dist = np.linalg.norm(
                (np.eye(3) - np.outer(nvec, nvec)) @ (cp[seg, j] - p0))
            viol = max(viol, dist - radii[seg, 0])
            viol = max(viol, -nvec @ cp[seg, j] + nvec @ cap0)
            viol = max(viol, nvec @ cp[seg, j] - nvec @ cap1)
    return viol


def test_qcqp_loose_radii_matches_unconstrained():
    structure, d_fixed, times, waypoints, _ = make_problem()
    radii = jnp.full((structure.n_segments, 2), 100.0)
    sol = qcqp.solve_qcqp(structure, d_fixed, times, waypoints, radii)
    unc = mtg.solve_linear(structure, d_fixed, times)
    assert bool(sol.converged)
    assert float(sol.max_violation) < 1e-6
    np.testing.assert_allclose(np.asarray(sol.d_free), np.asarray(unc.d_free),
                               rtol=1e-4, atol=1e-5)
    assert float(sol.cost) == pytest.approx(float(unc.cost), rel=1e-5)


def test_qcqp_tight_radii_feasible_and_more_costly():
    structure, d_fixed, times, waypoints, _ = make_problem()
    radii = jnp.full((structure.n_segments, 2), 0.4)
    sol = qcqp.solve_qcqp(structure, d_fixed, times, waypoints, radii)
    unc = mtg.solve_linear(structure, d_fixed, times)
    # ADMM moderate accuracy: small residual violation allowed.
    viol = constraint_violation(structure, sol, waypoints, radii)
    assert viol < 1e-3, viol
    assert float(sol.max_violation) < 1e-3
    assert float(sol.cost) >= float(unc.cost) - 1e-6


def test_qcqp_warmstart_and_batch():
    structure, d_fixed, times, waypoints, values = make_problem()
    radii = jnp.full((structure.n_segments, 2), 0.6)
    x0 = qcqp.position_constrained_warmstart(
        structure, jnp.asarray(values), times)
    sol = qcqp.solve_qcqp(structure, d_fixed, times, waypoints, radii, x0=x0)
    assert float(sol.max_violation) < 1e-3

    # Batch three radii settings via vmap.
    radii_batch = jnp.stack([jnp.full((structure.n_segments, 2), r)
                             for r in (0.5, 1.0, 50.0)])
    batched = jax.vmap(
        lambda r: qcqp.solve_qcqp(structure, d_fixed, times, waypoints, r))(
        radii_batch)
    assert batched.cost.shape == (3,)
    # Cost decreases as radii loosen.
    costs = np.asarray(batched.cost)
    assert costs[0] >= costs[1] >= costs[2] - 1e-9


def scipy_oracle(structure, d_fixed, times, waypoints, radii, x0):
    """Scipy trust-constr solve of the same QCQP (Mosek stand-in)."""
    from scipy.optimize import minimize, NonlinearConstraint
    nf = structure.n_fixed
    n_free = structure.n_free
    r = np.asarray(linear.assemble_r(structure, times))
    r_pf = r[nf:, :nf]
    r_pp = r[nf:, nf:]
    df = np.asarray(d_fixed)
    cons_sys = qcqp.build_constraints(structure, times, d_fixed,
                                      waypoints, radii)
    gb = np.asarray(cons_sys.g_ball)
    bb = np.asarray(cons_sys.b_ball)
    rb = np.asarray(cons_sys.r_ball)
    gh = np.asarray(cons_sys.g_half)
    bh = np.asarray(cons_sys.b_half)

    def unpack(x):
        return x.reshape(n_free, 3)

    obj_scale = 1.0 / max(np.abs(r_pp).max(), 1.0)

    def fun(x):
        xm = unpack(x)
        return obj_scale * float(np.einsum('pd,pq,qd->', xm, r_pp, xm)
                                 + 2.0 * np.einsum('fd,fp,pd->', df, r_pf, xm))

    def jac(x):
        xm = unpack(x)
        return obj_scale * (2.0 * r_pp @ xm + 2.0 * r_pf @ df).reshape(-1)

    def all_cons(x):
        xm = unpack(x)
        yb = np.einsum('bipd,pd->bi', gb, xm) + bb
        yh = np.einsum('hpd,pd->h', gh, xm) + bh
        return np.concatenate([rb ** 2 - np.sum(yb ** 2, axis=1), -yh])

    nlc = NonlinearConstraint(all_cons, 0.0, np.inf)
    res = minimize(fun, x0.reshape(-1), jac=jac, method="trust-constr",
                   constraints=[nlc],
                   options={"maxiter": 3000, "gtol": 1e-10, "xtol": 1e-12})
    return unpack(res.x), res


def test_qcqp_not_improvable_by_scipy():
    """Optimality cross-check: trust-constr polished from our solution must
    not materially reduce the objective.  (Cold-started trust-constr stalls
    at a worse point -- cost 16.7 vs our 2.87 on this fixture -- so the
    polish direction is the meaningful oracle here; global optimality is
    separately certified by test_qcqp_kkt_certificate.)"""
    structure, d_fixed, times, waypoints, _ = make_problem(k=3, seed=11)
    radii = jnp.full((structure.n_segments, 2), 0.5)
    sol = qcqp.solve_qcqp(structure, d_fixed, times, waypoints, radii)
    assert bool(sol.converged)
    assert float(sol.max_violation) < 1e-6
    x_polish, res = scipy_oracle(structure, d_fixed, times, waypoints, radii,
                                 np.asarray(sol.d_free))
    ours = linear.solve_linear_with_free(structure, d_fixed, sol.d_free, times)
    polished = linear.solve_linear_with_free(
        structure, d_fixed, jnp.asarray(x_polish), times)
    # Polish must not find a materially better feasible point.
    assert float(polished.cost) > float(ours.cost) * (1 - 5e-3)


def test_qcqp_kkt_certificate():
    """Convex QCQP: KKT => global optimality.  Verify stationarity,
    dual feasibility and complementary slackness from the ADMM duals."""
    structure, d_fixed, times, waypoints, _ = make_problem(k=4, seed=21)
    radii = jnp.full((structure.n_segments, 2), 0.5)
    cfg = qcqp.ADMMConfig(n_iters=400, eps_primal=1e-6, eps_dual=1e-6)
    sol = qcqp.solve_qcqp(structure, d_fixed, times, waypoints, radii,
                          config=cfg)

    nf = structure.n_fixed
    r = np.asarray(linear.assemble_r(structure, times))
    r_pf = r[nf:, :nf]
    r_pp = r[nf:, nf:]
    x = np.asarray(sol.d_free)
    grad_f = 2.0 * r_pp @ x + 2.0 * r_pf @ np.asarray(d_fixed)

    cons_sys = qcqp.build_constraints(structure, times, d_fixed, waypoints,
                                      radii)
    gb = np.asarray(cons_sys.g_ball)
    bb = np.asarray(cons_sys.b_ball)
    gh = np.asarray(cons_sys.g_half)
    nu_b = np.asarray(sol.dual_ball)
    nu_h = np.asarray(sol.dual_half)

    # Stationarity: grad f + G_ball^T nu_b + G_half^T nu_h = 0.
    station = (grad_f + np.einsum('bipd,bi->pd', gb, nu_b)
               + np.einsum('hpd,h->pd', gh, nu_h))
    scale = max(np.abs(grad_f).max(), 1.0)
    assert np.abs(station).max() / scale < 1e-3, np.abs(station).max() / scale

    # Dual feasibility for half spaces; ball duals must point outward
    # (nu_b parallel to y at the boundary).
    assert nu_h.min() > -1e-6
    yb = np.einsum('bipd,pd->bi', gb, x) + bb
    for b in range(yb.shape[0]):
        lam = np.linalg.norm(nu_b[b])
        if lam > 1e-6 * scale:
            cos = nu_b[b] @ yb[b] / (lam * np.linalg.norm(yb[b]) + 1e-30)
            assert cos > 0.99, (b, cos)


# ---------------------------------------------------------------------------
# Interior-point backend (solver/ipm.py).
# ---------------------------------------------------------------------------

def test_ipm_matches_admm_and_kkt():
    from mav_tube_trajectory_generation_tpu.solver import ipm
    for (k, seed, r) in [(3, 11, 0.5), (4, 3, 0.4), (8, 5, 0.5)]:
        structure, d_fixed, times, waypoints, _ = make_problem(k=k, seed=seed)
        radii = jnp.full((structure.n_segments, 2), r)
        s_admm = qcqp.solve_qcqp(structure, d_fixed, times, waypoints, radii,
                                 config=qcqp.ADMMConfig(n_stages=5,
                                                        n_iters=400))
        s_ipm = ipm.solve_qcqp_ipm(structure, d_fixed, times, waypoints, radii)
        assert bool(s_ipm.converged), (k, seed)
        assert float(s_ipm.max_violation) < 1e-6
        # IPM must be at least as good as converged ADMM (it is strictly
        # better on fixtures where ADMM's tail is slow).
        assert float(s_ipm.cost) <= float(s_admm.cost) * (1 + 1e-6)
        viol = constraint_violation(structure, s_ipm, waypoints, radii)
        assert viol < 1e-6, viol


def test_ipm_dual_warmstart_few_steps():
    """Primal+dual warm start from an ADMM solve must reach polished accuracy
    in ~1/3 the Newton steps of a cold start (the polished-path recipe)."""
    from mav_tube_trajectory_generation_tpu.solver import ipm
    for (k, seed, r) in [(4, 3, 0.4), (8, 5, 0.5)]:
        structure, d_fixed, times, waypoints, _ = make_problem(k=k, seed=seed)
        radii = jnp.full((structure.n_segments, 2), r)
        a = qcqp.solve_qcqp(structure, d_fixed, times, waypoints, radii,
                            config=qcqp.ADMMConfig(rho=0.005, n_stages=1,
                                                   n_iters=48,
                                                   rho_tube_factor=0.125,
                                                   rho_half_factor=0.125))
        warm = ipm.solve_qcqp_ipm(structure, d_fixed, times, waypoints, radii,
                                  config=ipm.IPMConfig(n_iters=10),
                                  x0=a.d_free, lam0_ball=a.dual_ball,
                                  lam0_half=a.dual_half)
        cold = ipm.solve_qcqp_ipm(structure, d_fixed, times, waypoints, radii)
        assert float(warm.max_violation) < 1e-6, (k, seed)
        assert float(warm.cost) <= float(cold.cost) * (1 + 1e-5), (k, seed)


def test_ipm_reports_infeasible():
    from mav_tube_trajectory_generation_tpu.solver import ipm
    structure, d_fixed, times, waypoints, _ = make_problem(k=4, seed=3)
    radii = jnp.full((structure.n_segments, 2), 1e-4)   # impossible tubes
    s = ipm.solve_qcqp_ipm(structure, d_fixed, times, waypoints, radii)
    assert not bool(s.converged)
    assert float(s.max_violation) > 1e-3
    assert np.all(np.isfinite(np.asarray(s.d_free)))


def test_ipm_vmap():
    from mav_tube_trajectory_generation_tpu.solver import ipm
    structure, d_fixed, times, waypoints, _ = make_problem(k=4, seed=3)
    radii_batch = jnp.stack([jnp.full((structure.n_segments, 2), r)
                             for r in (0.4, 0.8, 50.0)])
    out = jax.vmap(lambda r: ipm.solve_qcqp_ipm(
        structure, d_fixed, times, waypoints, r))(radii_batch)
    costs = np.asarray(out.cost)
    assert costs[0] >= costs[1] >= costs[2] - 1e-9
    unc = mtg.solve_linear(structure, d_fixed, times)
    assert costs[2] == pytest.approx(float(unc.cost), rel=1e-4)


def test_admm_pallas_interpret_matches_xla():
    """The Pallas kernel path (interpret mode on CPU) must agree with the
    XLA scan path."""
    import mav_tube_trajectory_generation_tpu.ops.admm_kernel as ak
    structure, d_fixed, times, waypoints, _ = make_problem(k=4, seed=3)
    radii = jnp.full((structure.n_segments, 2), 0.6)
    d32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
    args = (d32(d_fixed), d32(times), d32(waypoints), d32(radii))
    cfg_x = qcqp.ADMMConfig(n_stages=2, n_iters=50)
    cfg_p = qcqp.ADMMConfig(n_stages=2, n_iters=50, use_pallas=True)
    sx = qcqp.solve_qcqp(structure, args[0], args[1], args[2], args[3],
                         config=cfg_x)
    # Explicitly force interpret mode on BOTH fused kernel wrappers (the
    # default kkt_apply="factored" routes to admm_stage_fused_factored);
    # don't rely on the wrappers' implicit CPU auto-fallback.
    with _force_interpret(ak):
        sp = qcqp.solve_qcqp(structure, args[0], args[1], args[2], args[3],
                             config=cfg_p)
    np.testing.assert_allclose(np.asarray(sp.d_free), np.asarray(sx.d_free),
                               rtol=1e-2, atol=1e-3)


def test_admm_factored_kernel_matches_inverse_kernel():
    """kkt_apply="factored" (block-LDL^T factors into the kernel, m1 via
    in-VMEM block-Thomas sweeps) must agree with the dense-inverse kernel
    path it replaces."""
    structure, d_fixed, times, waypoints, _ = make_problem(k=4, seed=5)
    radii = jnp.full((structure.n_segments, 2), 0.6)
    d32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
    args = (d32(d_fixed), d32(times), d32(waypoints), d32(radii))
    sols = {}
    for apply_mode in ("factored", "inverse"):
        cfg = qcqp.ADMMConfig(n_stages=2, n_iters=40, use_pallas=True,
                              kkt_apply=apply_mode)
        sols[apply_mode] = qcqp.solve_qcqp(structure, *args, config=cfg)
    # f32 round-off: applying W^-1 explicitly vs the factored solve differ
    # in rounding, amplified over the 2x40 iterations.
    np.testing.assert_allclose(np.asarray(sols["factored"].d_free),
                               np.asarray(sols["inverse"].d_free),
                               rtol=5e-3, atol=5e-5)
    np.testing.assert_allclose(float(sols["factored"].max_violation),
                               float(sols["inverse"].max_violation),
                               atol=1e-4)


def test_padded_assembly_two_traces_one_process():
    """Two DIFFERENT jit programs touching the padded-assembly gather maps
    must not leak the first trace's constants into the second (regression:
    _GATHER_MAP_CACHE held jnp arrays materialized inside the first trace ->
    UnexpectedTracerError on any second program in the same process)."""
    structure, d_fixed, times, waypoints, _ = make_problem(k=4, seed=3)
    radii = jnp.full((structure.n_segments, 2), 0.6)
    d32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
    layout = qcqp._flagship_layout(structure)
    d_scale = jnp.ones((structure.n_free,), jnp.float32)
    for f_tube in (1.0, 0.5):   # distinct traces
        out = jax.jit(lambda t: qcqp._padded_constraint_system(
            structure, t, d32(d_fixed), d32(waypoints), d32(radii),
            d_scale, layout, 1.0, f_tube, 1.0)[0])(d32(times))
        assert np.all(np.isfinite(np.asarray(out)))


def test_solve_qcqp_batch_matches_per_scenario():
    """solve_qcqp_batch (S-blocked kernel, ragged padding) must reproduce
    the per-scenario vmap path bit-for-bit (same kernel math, interleaved)."""
    import mav_tube_trajectory_generation_tpu.ops.admm_kernel as ak
    structure, d_fixed, times, waypoints, values = make_problem(k=4, seed=3)
    b = 6
    d32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
    rng = np.random.RandomState(0)
    dff = jnp.stack([d32(d_fixed) * (1 + 0.01 * i) for i in range(b)])
    t_b = jnp.stack([d32(times)] * b)
    wp_b = jnp.stack([d32(waypoints)] * b)
    r_b = jnp.full((b, structure.n_segments, 2), 0.6, jnp.float32)
    cfg = qcqp.ADMMConfig(n_stages=2, n_iters=30, use_pallas=True)
    with _force_interpret(ak):
        s1 = jax.vmap(lambda a, c, d, e: qcqp.solve_qcqp(
            structure, a, c, d, e, config=cfg))(dff, t_b, wp_b, r_b)
        s4 = qcqp.solve_qcqp_batch(structure, dff, t_b, wp_b, r_b,
                                   config=cfg, scenario_block=4)  # pads 6->8
    np.testing.assert_array_equal(np.asarray(s4.d_free),
                                  np.asarray(s1.d_free))
    np.testing.assert_array_equal(np.asarray(s4.max_violation),
                                  np.asarray(s1.max_violation))
    assert s4.cost.shape == (b,)


def test_warmstarted_admm_near_optimal():
    """The production config (rho=0.005, 1 stage x 48 iters, tube/half
    penalty factors 0.125, warm start) must stay feasible and land near a
    1600-iteration reference solve: ~0.3% median on the benchmark
    distribution; within 10% on these harder wide-spread fixtures."""
    for (k, seed, r) in [(4, 3, 0.4), (8, 5, 0.5)]:
        structure, d_fixed, times, waypoints, values = make_problem(
            k=k, seed=seed)
        radii = jnp.full((structure.n_segments, 2), r)
        x0 = qcqp.position_constrained_warmstart(
            structure, jnp.asarray(values), times)
        # The production bench config (single stage, one factorization).
        fast = qcqp.solve_qcqp(
            structure, d_fixed, times, waypoints, radii,
            config=qcqp.ADMMConfig(rho=0.005, n_stages=1, n_iters=48,
                                   rho_tube_factor=0.125,
                                   rho_half_factor=0.125), x0=x0)
        ref = qcqp.solve_qcqp(
            structure, d_fixed, times, waypoints, radii,
            config=qcqp.ADMMConfig(rho=0.003, n_stages=4, n_iters=400), x0=x0)
        assert float(fast.max_violation) < 1e-2
        assert float(fast.cost) <= float(ref.cost) * 1.10 + 1e-9


def test_solve_qcqp_polished_reaches_optimum():
    """ADMM + short IPM polish must reach IPM-grade accuracy (the
    recommended Mosek-parity path)."""
    from mav_tube_trajectory_generation_tpu.solver import ipm
    structure, d_fixed, times, waypoints, values = make_problem(k=8, seed=5)
    radii = jnp.full((structure.n_segments, 2), 0.5)
    x0 = qcqp.position_constrained_warmstart(
        structure, jnp.asarray(values), times)
    pol = ipm.solve_qcqp_polished(structure, d_fixed, times, waypoints,
                                  radii, x0=x0)
    full = ipm.solve_qcqp_ipm(structure, d_fixed, times, waypoints, radii)
    assert bool(pol.converged)
    assert float(pol.max_violation) < 1e-8
    assert float(pol.cost) == pytest.approx(float(full.cost), rel=1e-4)


def test_ipm_infeasibility_certificate():
    """The IPM must distinguish 'problem infeasible' (diverging duals along
    a Farkas direction) from 'solver stalled' (VERDICT round-1 missing #5)."""
    from mav_tube_trajectory_generation_tpu.solver import ipm
    structure, d_fixed, times, waypoints, _ = make_problem(k=4, seed=3)
    radii_bad = jnp.full((structure.n_segments, 2), 1e-4)
    s_bad = ipm.solve_qcqp_ipm(structure, d_fixed, times, waypoints,
                               radii_bad)
    assert not bool(s_bad.converged)
    assert bool(s_bad.infeasible)
    radii_ok = jnp.full((structure.n_segments, 2), 0.6)
    # Feasible + converged: no certificate.
    s_ok = ipm.solve_qcqp_ipm(structure, d_fixed, times, waypoints, radii_ok)
    assert bool(s_ok.converged) and not bool(s_ok.infeasible)
    # Feasible but STALLED (budget too small): not converged, and the
    # certificate must NOT fire -- that is the whole point.
    s_stall = ipm.solve_qcqp_ipm(structure, d_fixed, times, waypoints,
                                 radii_ok, config=ipm.IPMConfig(n_iters=3))
    assert not bool(s_stall.converged)
    assert not bool(s_stall.infeasible)


def test_ipm_convergence_scale_invariant():
    """converged must not depend on the problem's cost scale (VERDICT
    round-1 weak #2): the same geometry blown up 10x has ~1e3x the cost."""
    from mav_tube_trajectory_generation_tpu.solver import ipm
    structure, d_fixed, times, waypoints, _ = make_problem(k=4, seed=3)
    radii = jnp.full((structure.n_segments, 2), 0.6)
    for scale in (1.0, 10.0):
        s = ipm.solve_qcqp_ipm(structure, d_fixed * scale, times,
                               waypoints * scale, radii * scale)
        assert bool(s.converged), scale


def test_admm_config_validation():
    with pytest.raises(ValueError, match="kkt_apply"):
        qcqp.ADMMConfig(kkt_apply="fctored")
    with pytest.raises(ValueError, match="kkt_inverse"):
        qcqp.ADMMConfig(kkt_inverse="cholsky")


def test_ipm_static_infeasibility_certificate():
    """A violated CONSTANT constraint row (zero Jacobian: the first
    segment's leading control points depend only on the fixed start state)
    stalls the fraction-to-boundary step, so the dynamic Farkas certificate
    cannot fire; the closed-form static certificate must."""
    from mav_tube_trajectory_generation_tpu.solver import ipm
    structure, d_fixed, times, waypoints, _ = make_problem(k=4, seed=3)
    radii = jnp.full((structure.n_segments, 2), 0.3)
    # Offset the fixed start position 5 radii off the corridor axis: the
    # start-state control points now violate tube constraints structurally.
    d_bad = jnp.asarray(np.asarray(d_fixed).copy())
    d_bad = d_bad.at[0, :].add(jnp.asarray([0.0, 1.5, 0.0]))
    s = ipm.solve_qcqp_ipm(structure, d_bad, times, waypoints, radii)
    assert not bool(s.converged)
    assert bool(s.infeasible)
    # The unperturbed problem stays feasible, certificate silent.
    s_ok = ipm.solve_qcqp_ipm(structure, d_fixed, times, waypoints, radii)
    assert not bool(s_ok.infeasible)
