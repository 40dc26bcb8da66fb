"""Plane-layout IPM (solver/ipm_lanes) vs the row-layout reference backend.

The lanes path must reproduce the rows path's SOLUTIONS (not its float32
iteration chaos): near-identical optimal costs on feasible scenarios, and
violations in the same or better class.  Runs on CPU with the kernel in
interpret mode (ops/ipm_kernel auto-falls back off-TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mav_tube_trajectory_generation_tpu.solver import ipm, ipm_lanes, qcqp
from mav_tube_trajectory_generation_tpu.solver.structure import (
    free_interior_mask, make_structure)
from mav_tube_trajectory_generation_tpu.models.vertex import (
    segment_times_nfabian)


K, N, D = 10, 10, 3


@pytest.fixture(scope="module")
def scenario_batch():
    rng = np.random.RandomState(11)
    b = 8
    waypoints = np.cumsum(rng.uniform(0.5, 2.0, size=(b, K + 1, 3)),
                          axis=1).astype(np.float32)
    free = make_structure(free_interior_mask(K + 1, N), D, N)
    values = np.zeros((b, K + 1, 5, 3), dtype=np.float32)
    values[:, :, 0, :] = waypoints
    times = np.asarray(segment_times_nfabian(waypoints, 3.0, 5.0),
                       dtype=np.float32)
    radii = np.full((b, K, 2), 0.8, dtype=np.float32)
    from mav_tube_trajectory_generation_tpu.solver import linear
    df = np.asarray(linear.extract_fixed_values(free, jnp.asarray(values)),
                    dtype=np.float32)
    admm = qcqp.ADMMConfig(rho=0.005, n_stages=1, n_iters=48,
                           rho_tube_factor=0.125, rho_half_factor=0.125,
                           use_pallas=True)
    a = qcqp.solve_qcqp_batch(free, df, jnp.asarray(times),
                              jnp.asarray(waypoints), jnp.asarray(radii),
                              config=admm, warmstart_values=values,
                              scenario_block=4)
    return (free, jnp.asarray(df), jnp.asarray(times),
            jnp.asarray(waypoints), jnp.asarray(radii), a)


@pytest.mark.slow
def test_lanes_matches_rows_solutions(scenario_batch):
    """Warm-started lanes IPM lands on the rows backend's optima: median
    cost within 0.1%, worst within 1% (both f32 endgames are chaotic -- the
    iterates differ, the optima must not)."""
    free, df, times, waypoints, radii, a = scenario_batch
    cfg = ipm.IPMConfig(n_iters=10)
    rows = jax.vmap(lambda *xs: ipm.solve_qcqp_ipm(
        free, xs[0], xs[1], xs[2], xs[3], config=cfg, x0=xs[4],
        lam0_ball=xs[5], lam0_half=xs[6]))(
        df, times, waypoints, radii, a.d_free, a.dual_ball, a.dual_half)
    lanes = ipm_lanes.solve_qcqp_ipm_lanes(
        free, df, times, waypoints, radii, config=cfg, x0=a.d_free,
        lam0_ball=a.dual_ball, lam0_half=a.dual_half, scenario_block=4)
    rel = np.abs(np.asarray(lanes.cost) - np.asarray(rows.cost)) \
        / np.asarray(rows.cost)
    assert np.median(rel) < 1e-3, rel
    assert rel.max() < 1e-2, rel
    # The polish must not give BACK feasibility vs the ADMM start.
    assert float(np.median(np.asarray(lanes.max_violation))) < \
        max(2.0 * float(np.median(np.asarray(a.max_violation))), 1e-4)


@pytest.mark.slow
def test_lanes_improves_admm_tail(scenario_batch):
    """The safeguarded lanes endgame keeps every scenario under the 1e-3
    class and the median in the 1e-4 class (the rows path relies on
    best-iterate luck and has a fatter tail on this seed)."""
    free, df, times, waypoints, radii, a = scenario_batch
    lanes = ipm_lanes.solve_qcqp_ipm_lanes(
        free, df, times, waypoints, radii, config=ipm.IPMConfig(n_iters=10),
        x0=a.d_free, lam0_ball=a.dual_ball, lam0_half=a.dual_half,
        scenario_block=4)
    v = np.asarray(lanes.max_violation)
    assert v.max() < 3e-3, v
    assert np.median(v) < 2e-4, v


@pytest.mark.slow
def test_lanes_cold_start_runs(scenario_batch):
    free, df, times, waypoints, radii, _ = scenario_batch
    lanes = ipm_lanes.solve_qcqp_ipm_lanes(
        free, df, times, waypoints, radii,
        config=ipm.IPMConfig(n_iters=25), scenario_block=4)
    v = np.asarray(lanes.max_violation)
    assert np.isfinite(np.asarray(lanes.cost)).all()
    assert np.median(v) < 1e-2, v


@pytest.mark.slow
def test_lanes_scenario_block_invariance(scenario_batch):
    """S-blocking is a layout choice, not a semantic one."""
    free, df, times, waypoints, radii, a = scenario_batch
    cfg = ipm.IPMConfig(n_iters=6)
    kw = dict(config=cfg, x0=a.d_free, lam0_ball=a.dual_ball,
              lam0_half=a.dual_half)
    s4 = ipm_lanes.solve_qcqp_ipm_lanes(
        free, df, times, waypoints, radii, scenario_block=4, **kw)
    s2 = ipm_lanes.solve_qcqp_ipm_lanes(
        free, df, times, waypoints, radii, scenario_block=2, **kw)
    np.testing.assert_allclose(np.asarray(s4.cost), np.asarray(s2.cost),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s4.d_free), np.asarray(s2.d_free),
                               atol=1e-5)


@pytest.mark.slow
def test_lanes_static_infeasibility_certificate(scenario_batch):
    """A fixed start state far outside the corridor makes constant
    constraint rows violated: the static certificate must fire."""
    free, df, times, waypoints, radii, _ = scenario_batch
    df_bad = np.asarray(df).copy()
    # Push the start position 5 units off every axis: the early control
    # points depend only on fixed start derivatives.
    df_bad[:, 0, :] += 5.0
    tiny = np.full_like(np.asarray(radii), 0.05)
    lanes = ipm_lanes.solve_qcqp_ipm_lanes(
        free, jnp.asarray(df_bad), times, waypoints, jnp.asarray(tiny),
        config=ipm.IPMConfig(n_iters=8), scenario_block=4)
    assert bool(np.asarray(lanes.infeasible).all())


@pytest.mark.slow
def test_fused_kernel_matches_scan_path(scenario_batch):
    """The whole-IPM fused kernel (ops/ipm_kernel.ipm_solve_fused) lands in
    the scan path's solution class: costs within 0.1% median / 1% worst,
    violations in the same class.  (Bitwise equality is not expected: the
    fused factor uses in-kernel Gauss-Jordan pivot inverses, the scan path
    banded.spd_block_tridiag_factor -- different f32 rounding, same
    endgame.)"""
    free, df, times, waypoints, radii, a = scenario_batch
    kw = dict(x0=a.d_free, lam0_ball=a.dual_ball, lam0_half=a.dual_half,
              scenario_block=4)
    scan = ipm_lanes.solve_qcqp_ipm_lanes(
        free, df, times, waypoints, radii,
        config=ipm.IPMConfig(n_iters=10, sigma_min=0.3, corrector=False),
        **kw)
    fused = ipm_lanes.solve_qcqp_ipm_lanes(
        free, df, times, waypoints, radii,
        config=ipm.IPMConfig(n_iters=10, sigma_min=0.3, corrector=False,
                             fused=True), **kw)
    rel = np.abs(np.asarray(fused.cost) - np.asarray(scan.cost)) \
        / np.asarray(scan.cost)
    assert np.median(rel) < 1e-3, rel
    assert rel.max() < 1e-2, rel
    v = np.asarray(fused.max_violation)
    assert v.max() < 3e-3, v
    assert np.median(v) < 2e-4, v
    # Mehrotra + fused is rejected (the kernel implements corrector=False).
    with pytest.raises(ValueError):
        ipm_lanes.solve_qcqp_ipm_lanes(
            free, df, times, waypoints, radii,
            config=ipm.IPMConfig(n_iters=2, fused=True), **kw)


@pytest.mark.slow
def test_pipelined_kernel_matches_scan_path(scenario_batch):
    """The pipelined step kernel (ops/ipm_kernel.ipm_pipe_step: previous
    step's factored solve + update fused with the next eval, XLA keeping
    only the batched band factor) lands in the scan path's solution class."""
    free, df, times, waypoints, radii, a = scenario_batch
    kw = dict(x0=a.d_free, lam0_ball=a.dual_ball, lam0_half=a.dual_half,
              scenario_block=4)
    scan = ipm_lanes.solve_qcqp_ipm_lanes(
        free, df, times, waypoints, radii,
        config=ipm.IPMConfig(n_iters=10, sigma_min=0.3, corrector=False),
        **kw)
    pipe = ipm_lanes.solve_qcqp_ipm_lanes(
        free, df, times, waypoints, radii,
        config=ipm.IPMConfig(n_iters=10, sigma_min=0.3, corrector=False,
                             pipelined=True), **kw)
    rel = np.abs(np.asarray(pipe.cost) - np.asarray(scan.cost)) \
        / np.asarray(scan.cost)
    assert np.median(rel) < 1e-3, rel
    assert rel.max() < 1e-2, rel
    v = np.asarray(pipe.max_violation)
    assert v.max() < 3e-3, v
    assert np.median(v) < 2e-4, v


def test_finite_step_mask_catches_nan_directions():
    """A NaN Newton direction yields a *finite* alpha (NaN < 0 is False in
    the fraction-to-boundary ratios -> all inf -> alpha = 1.0), so the
    update gate must check the direction itself -- an isfinite(alpha) guard
    never fires (the advisor-verified failure mode)."""
    b, m = 3, 7
    ds = jnp.ones((b, m), jnp.float32)
    dlam = jnp.ones((b, m), jnp.float32)
    ds = ds.at[1].set(jnp.nan)           # scenario 1: blown-up direction
    dlam = dlam.at[2, 4].set(jnp.inf)    # scenario 2: one inf entry
    # Reproduce the alpha a NaN direction produces through max_step.
    v = jnp.full((b, m), 0.5, jnp.float32)
    ratio = jnp.where(ds < 0, -v / jnp.where(ds < 0, ds, -1.0), jnp.inf)
    alpha = jnp.minimum(1.0, 0.995 * jnp.min(ratio, axis=-1, keepdims=True))
    assert bool(jnp.isfinite(alpha).all())   # the old guard would pass NaNs
    upd = ipm_lanes._finite_step_mask(alpha, ds, dlam)
    np.testing.assert_array_equal(np.asarray(upd[:, 0]),
                                  [True, False, False])


@pytest.mark.slow
def test_lanes_internal_batch_padding(scenario_batch):
    """A batch that is not a scenario_block multiple is padded internally
    and the outputs sliced back -- same contract as solve_qcqp_batch."""
    free, df, times, waypoints, radii, a = scenario_batch
    cfg = ipm.IPMConfig(n_iters=4)
    kw = dict(config=cfg, x0=a.d_free, lam0_ball=a.dual_ball,
              lam0_half=a.dual_half)
    full = ipm_lanes.solve_qcqp_ipm_lanes(
        free, df, times, waypoints, radii, scenario_block=4, **kw)
    kw5 = dict(config=cfg, x0=a.d_free[:5], lam0_ball=a.dual_ball[:5],
               lam0_half=a.dual_half[:5])
    part = ipm_lanes.solve_qcqp_ipm_lanes(
        free, df[:5], times[:5], waypoints[:5], radii[:5],
        scenario_block=4, **kw5)
    assert part.cost.shape == (5,)
    np.testing.assert_allclose(np.asarray(part.cost),
                               np.asarray(full.cost[:5]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(part.d_free),
                               np.asarray(full.d_free[:5]), atol=1e-5)


def test_ipm_kernel_eval_matches_xla_core():
    """The Pallas kernel (interpret) and a direct _eval_core call agree."""
    from mav_tube_trajectory_generation_tpu.ops import ipm_kernel
    rng = np.random.RandomState(0)
    s_blk, nfd, nb_p, nh_p = 2, 24, 128, 128
    m_p = 3 * nb_p + nh_p
    n_ball = 17
    gt = jnp.asarray(rng.randn(s_blk, nfd, m_p).astype(np.float32))
    b = jnp.asarray(rng.randn(s_blk, 1, m_p).astype(np.float32))
    rb = jnp.asarray(rng.uniform(0.5, 2.0, (s_blk, 1, nb_p))
                     .astype(np.float32))
    x = jnp.asarray(rng.randn(s_blk, nfd, 1).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.1, 2.0, (s_blk, 1, m_p))
                    .astype(np.float32))
    lam = jnp.asarray(rng.uniform(0.0, 1.0, (s_blk, 1, m_p))
                      .astype(np.float32))
    y, c, jtwr2, jts, gram = ipm_kernel.ipm_eval_step(
        gt, b, rb, x, s, lam, nb_p=nb_p, n_ball=n_ball, interpret=True)
    y2, c2, jtwr22, jts2, lam_ball, aj, w_aj = ipm_kernel._eval_core(
        gt, b, rb, x, s, lam, nb_p=nb_p, n_ball=n_ball, w_cap=1e10)
    gram2 = jnp.einsum('snm,som->sno', gt * lam_ball, gt) \
        + jnp.einsum('snm,som->sno', aj * w_aj, aj)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jtwr2), np.asarray(jtwr22),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(gram), np.asarray(gram2),
                               rtol=1e-4, atol=1e-3)
