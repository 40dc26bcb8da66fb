"""Tests for the nonlinear outer loop (reference test pattern: optimizer must
not fail, final cost <= 1.1x initial, magnitudes within bounds --
UnconstrainedNonlinear, test_polynomial_optimization.cpp:408-508)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mav_tube_trajectory_generation_tpu as mtg
from mav_tube_trajectory_generation_tpu.solver import linear, nonlinear
from mav_tube_trajectory_generation_tpu.solver import structure as sm

N = 10
H = N // 2


def build(dim=3, k=4, seed=3):
    verts = mtg.create_random_vertices(H - 1, k, np.zeros(dim),
                                       6 * np.ones(dim), seed)
    structure, values = mtg.structure_from_vertices(verts, N, mtg.SNAP)
    times = jnp.asarray(mtg.estimate_segment_times(verts, 2.0, 2.0))
    d_fixed = mtg.extract_fixed_values(structure, jnp.asarray(values))
    return structure, d_fixed, times, values


def test_time_objective_nelder_mead_decreases_cost():
    structure, d_fixed, times, _ = build()
    params = nonlinear.NonlinearParameters(
        objective=nonlinear.Objective.TIME, max_iterations=40,
        time_penalty=500.0, use_soft_constraints=False)
    res = nonlinear.optimize(structure, d_fixed, times, params)
    assert float(res.cost.total) <= 1.1 * float(res.initial_cost.total)
    # Times must respect the reference box [0.1, 2 t_init].
    t = np.asarray(res.times)
    assert np.all(t >= 0.1 - 1e-9)
    assert np.all(t <= 2.0 * np.asarray(times) + 1e-9)


def test_time_gradient_beats_nelder_mead():
    structure, d_fixed, times, _ = build()
    params = nonlinear.NonlinearParameters(
        objective=nonlinear.Objective.TIME, max_iterations=30,
        time_penalty=500.0, use_soft_constraints=False)
    t_nm_res = nonlinear.optimize(structure, d_fixed, times, params)
    t_gd, values = nonlinear.optimize_time_gradient(
        structure, d_fixed, times, params, n_iters=30)
    sol_gd = mtg.solve_linear(structure, d_fixed, t_gd)
    cost_gd = float(sol_gd.cost) + float(
        nonlinear.time_cost(t_gd, params.time_penalty))
    sol_nm = mtg.solve_linear(structure, d_fixed, t_nm_res.times)
    cost_nm = float(sol_nm.cost) + float(
        nonlinear.time_cost(t_nm_res.times, params.time_penalty))
    # Analytic gradients through the solve should match or beat the simplex.
    assert cost_gd <= cost_nm * 1.05
    # And strictly improve on the initial guess.
    sol_0 = mtg.solve_linear(structure, d_fixed, times)
    cost_0 = float(sol_0.cost) + float(
        nonlinear.time_cost(times, params.time_penalty))
    assert cost_gd < cost_0


def test_free_constraints_objective_reduces_derivative_cost():
    structure, d_fixed, times, _ = build()
    # Perturb the free constraints away from the optimum; L-BFGS must pull
    # the derivative cost back to (near) the closed-form minimum.
    sol = mtg.solve_linear(structure, d_fixed, times)
    rng = np.random.RandomState(0)
    d_free0 = sol.d_free + 0.5 * jnp.asarray(
        rng.randn(*np.asarray(sol.d_free).shape))
    params = nonlinear.NonlinearParameters(
        objective=nonlinear.Objective.FREE_CONSTRAINTS, max_iterations=40,
        use_soft_constraints=False)
    res = nonlinear.optimize(structure, d_fixed, times, params,
                             d_free_init=d_free0)
    j_opt = float(nonlinear.derivative_cost(structure, d_fixed, sol.d_free,
                                            times))
    j_fin = float(nonlinear.derivative_cost(structure, d_fixed, res.d_free,
                                            times))
    j_init = float(nonlinear.derivative_cost(structure, d_fixed, d_free0,
                                             times))
    assert j_fin < j_init
    assert j_fin <= j_opt * 1.01 + 1e-9


def test_soft_constraints_reduce_max_velocity():
    structure, d_fixed, times, _ = build(seed=9)
    v_limit = 1.5
    cons = [nonlinear.MagnitudeConstraint(mtg.VELOCITY, v_limit)]
    params = nonlinear.NonlinearParameters(
        objective=nonlinear.Objective.FREE_CONSTRAINTS_AND_TIME,
        max_iterations=60, time_penalty=0.0,
        use_soft_constraints=True, soft_constraint_weight=10.0,
        weights=nonlinear.CostWeights(w_d=0.1, w_sc=10.0))
    sol0 = mtg.solve_linear(structure, d_fixed, times)
    vmax0 = float(nonlinear.max_magnitude_from_d(
        structure, d_fixed, sol0.d_free, times, mtg.VELOCITY))
    res = nonlinear.optimize(structure, d_fixed, times, params,
                             constraints=cons)
    vmax1 = float(nonlinear.max_magnitude_from_d(
        structure, d_fixed, res.d_free, res.times, mtg.VELOCITY))
    # Reference pattern: extrema within 1.5x bounds after optimization.
    if vmax0 > v_limit:
        assert vmax1 < vmax0 * 1.001
    assert vmax1 <= 1.5 * v_limit


def test_collision_objective_avoids_obstacle():
    # Straight path through a box obstacle; collision objective must push the
    # path around it.
    dim, k = 3, 2
    structure = sm.make_structure(sm.standard_mask(k + 1, N), dim, N)
    values = np.zeros((k + 1, H, dim))
    values[0, 0] = [0.2, 1.0, 1.0]
    values[1, 0] = [1.0, 1.0, 1.0]   # waypoint right in front of the box
    values[2, 0] = [1.8, 1.0, 1.0]
    d_fixed = mtg.extract_fixed_values(structure, jnp.asarray(values))
    times = jnp.asarray([3.0, 3.0])

    # Asymmetric box so the straight-through path is not a gradient saddle.
    occ = mtg.make_obstacle_grid((20, 20, 20), (0, 0, 0), 0.1,
                                 boxes=[((1.15, 0.9, 0.85),
                                         (1.45, 1.35, 1.3))])
    field = mtg.esdf_from_occupancy(occ, (0, 0, 0), 0.1, dtype=jnp.float64)

    params = nonlinear.NonlinearParameters(
        objective=nonlinear.Objective.FREE_CONSTRAINTS_AND_COLLISION,
        max_iterations=100, use_soft_constraints=False,
        robot_radius=0.1, epsilon=0.3, collision_samples_per_segment=64,
        weights=nonlinear.CostWeights(w_d=0.1, w_c=1000.0))
    res = nonlinear.optimize(structure, d_fixed, times, params, field=field)
    j_c0 = float(res.initial_cost.collision)
    j_c1 = float(res.cost.collision)
    assert j_c1 < j_c0 * 0.5, (j_c0, j_c1)

    # The optimized path must keep clearance >= robot radius at samples.
    traj = mtg.Trajectory(res.coefficients, res.times)
    ts = np.linspace(0, float(np.sum(np.asarray(res.times))) - 1e-9, 200)
    pos = mtg.evaluate(traj, jnp.asarray(ts), 0)
    dmin = float(jnp.min(mtg.distance_at(field, pos)))
    assert dmin > params.robot_radius, dmin


def test_vmapped_nonlinear_optimize():
    structure, d_fixed, times, _ = build()
    params = nonlinear.NonlinearParameters(
        objective=nonlinear.Objective.FREE_CONSTRAINTS_AND_TIME,
        max_iterations=10, use_soft_constraints=False)
    batch_df = jnp.stack([d_fixed, d_fixed * 1.1, d_fixed * 0.9])
    batch_t = jnp.stack([times, times, times * 1.2])
    res = jax.vmap(lambda df, t: nonlinear.optimize(
        structure, df, t, params))(batch_df, batch_t)
    assert res.cost.total.shape == (3,)
    assert np.all(np.isfinite(np.asarray(res.cost.total)))


def test_time_objective_with_qcqp_inner():
    """TIME objective re-solving the tube QCQP per evaluation (the
    reference's objectiveFunctionTime path, stack 3.4 of SURVEY.md)."""
    from mav_tube_trajectory_generation_tpu.solver import qcqp as qcqp_mod
    k = 3
    rng = np.random.RandomState(5)
    waypoints = np.cumsum(rng.uniform(0.8, 1.5, size=(k + 1, 3)), axis=0)
    structure = sm.make_structure(sm.free_interior_mask(k + 1, N), 3, N)
    values = np.zeros((k + 1, H, 3))
    values[0, 0] = waypoints[0]
    values[-1, 0] = waypoints[-1]
    d_fixed = mtg.extract_fixed_values(structure, jnp.asarray(values))
    times = jnp.asarray(mtg.segment_times_nfabian(waypoints, 2.0, 2.0))
    radii = jnp.full((k, 2), 0.6)
    params = nonlinear.NonlinearParameters(
        objective=nonlinear.Objective.TIME, max_iterations=12,
        time_penalty=100.0, use_soft_constraints=False)
    res = nonlinear.optimize(
        structure, d_fixed, times, params, waypoints=jnp.asarray(waypoints),
        radii=radii,
        admm_config=qcqp_mod.ADMMConfig(rho=0.01, n_stages=2, n_iters=60))
    assert float(res.cost.total) <= 1.1 * float(res.initial_cost.total)
    assert np.all(np.isfinite(np.asarray(res.coefficients)))


def test_collision_and_time_joint_objective():
    structure, d_fixed, times, _ = build(k=2, seed=11)
    occ = mtg.make_obstacle_grid((16, 16, 16), (0, 0, 0), 0.4, spheres=[
        ((3.0, 3.0, 3.0), 0.5)])
    field = mtg.esdf_from_occupancy(occ, (0, 0, 0), 0.4, dtype=jnp.float64)
    params = nonlinear.NonlinearParameters(
        objective=nonlinear.Objective.FREE_CONSTRAINTS_AND_COLLISION_AND_TIME,
        max_iterations=15, time_penalty=10.0, use_soft_constraints=False,
        weights=nonlinear.CostWeights(w_d=0.1, w_c=10.0, w_t=1.0))
    res = nonlinear.optimize(structure, d_fixed, times, params, field=field)
    assert float(res.cost.total) <= 1.1 * float(res.initial_cost.total)
    assert np.all(np.isfinite(np.asarray(res.times)))


def test_format_result():
    structure, d_fixed, times, _ = build(k=2, seed=1)
    params = nonlinear.NonlinearParameters(
        objective=nonlinear.Objective.FREE_CONSTRAINTS, max_iterations=3,
        use_soft_constraints=False)
    res = nonlinear.optimize(structure, d_fixed, times, params)
    report = nonlinear.format_result(res)
    assert "cost trajectory" in report and "iterations: 3" in report


def test_hard_magnitude_constraint_augmented_lagrangian():
    """use_soft_constraints=False + constraints engages the augmented-
    Lagrangian hard path (reference: NLOPT add_inequality_constraint,
    nonlinear_impl.h:848-875): the final max ||v|| must respect the bound
    within inequality_constraint_tolerance, and the derivative cost must
    stay finite and above the unconstrained optimum."""
    structure, d_fixed, times, _ = build(seed=7)
    params0 = nonlinear.NonlinearParameters(
        objective=nonlinear.Objective.FREE_CONSTRAINTS, max_iterations=40,
        use_soft_constraints=False)
    free0 = nonlinear.optimize(structure, d_fixed, times, params0)
    vmax0 = float(nonlinear.max_magnitude_from_d(
        structure, d_fixed, free0.d_free, times, 1))
    bound = 0.8 * vmax0   # force the constraint to be active

    cons = [nonlinear.MagnitudeConstraint(derivative=1, value=bound)]
    res = nonlinear.optimize(structure, d_fixed, times, params0,
                             constraints=cons)
    vmax = float(nonlinear.max_magnitude_from_d(
        structure, d_fixed, res.d_free, times, 1))
    tol = params0.inequality_constraint_tolerance
    assert vmax <= bound * (1.0 + tol), (vmax, bound)
    # Constrained optimum cannot beat the unconstrained one.
    assert float(res.cost.trajectory) >= float(free0.cost.trajectory) - 1e-6
    assert np.isfinite(float(res.cost.total))
    # maxima report reflects the constrained derivative.
    assert 1 in res.maxima
