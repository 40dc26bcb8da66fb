"""Production verdict router: ADMM gate + selective IPM escalation.

The reference returns Mosek's interior-point verdict at every corridor
width (qcqp_impl.h:709-788).  The TPU headline path (48-iteration warm-
started ADMM, solver/qcqp.solve_qcqp_batch) matches that verdict >=98% of
the time on generous corridors but is CONSERVATIVE on tight ones: the
fixed first-order iteration budget stops short of the 1e-2 feasibility
gate on scenarios an interior-point method solves fine (measured:
agreement 65% at radii 0.3-0.5, ~17% below 0.3 -- every disagreement a
gate MISS, never a false-feasible; benchmarks/verdict_parity_results.json).

``solve_qcqp_auto`` closes that gap the way a production deployment
should: every scenario gets the throughput ADMM solve, and ONLY the
scenarios failing the gate are re-solved by the plane-layout IPM polish
(solver/ipm_lanes), warm-started from their ADMM iterate.  On generous
corridors <1% escalate and the blended throughput is ~the headline's; on
tight corridors the verdict quality is the IPM's everywhere.

Escalation is a host-gathered second fixed-shape batch: the gate mask is
pulled to the host, failure indices gathered, padded to a power-of-two
bucket (a handful of compiled program shapes, no dynamic shapes inside
jit), solved, and scattered back.  This is the deliberate jit boundary --
the verdict decides a DIFFERENT PROGRAM per scenario, which is host
control flow by nature (the reference's analogue: the Mosek status switch,
qcqp_impl.h:715-770).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import ipm_lanes
from .ipm import IPMConfig
from .qcqp import ADMMConfig, QCQPSolution
from .structure import ProblemStructure

#: Verdict codes (int8): +1 feasible, -1 infeasible (certificate), 0
#: undetermined (neither a feasible point to tolerance nor a certificate --
#: near-degenerate corridors; the reference would surface Mosek's
#: MSK_SOL_STA_UNKNOWN here).
FEASIBLE = np.int8(1)
INFEASIBLE = np.int8(-1)
UNDETERMINED = np.int8(0)


class AutoResult(NamedTuple):
    solution: QCQPSolution        # merged batch (ADMM or escalated-IPM rows)
    verdict: np.ndarray           # (B,) int8: +1 / -1 / 0 (see module codes)
    escalated: np.ndarray         # (B,) bool: row was re-solved by the IPM
    n_escalated: int


#: Cached jitted tier functions, keyed by (structure id, configs, flags):
#: the tier solves run outside any caller jit (the router's gate/gather is
#: host control flow), so without this every call would dispatch the solver
#: graph op-by-op -- ruinous over a remote-device tunnel.  Configs are
#: frozen dataclasses (hashable); structure identity is the static-problem
#: key (the same object callers thread everywhere).
_TIER_CACHE: dict = {}


def _cached_jit(key, builder):
    fn = _TIER_CACHE.get(key)
    if fn is None:
        fn = jax.jit(builder())
        _TIER_CACHE[key] = fn
    return fn


def _bucket(n: int, block: int) -> int:
    """Escalation-batch bucket size >= n: power-of-two multiples of
    ``block`` up to 256 (tiny escalation sets on generous corridors), then
    multiples of 256 (a 1079-row set padded to a 2048 power-of-two bucket
    measurably halves blended throughput; 256-granularity keeps the
    compiled-shape count bounded at ~log2(256) + B/256 while wasting at
    most 255 rows of polish)."""
    b = block
    while b < min(n, 256):
        b *= 2
    if n <= b:
        return b
    return ((n + 255) // 256) * 256


def solve_qcqp_auto(structure: ProblemStructure,
                    d_fixed: jnp.ndarray,
                    times: jnp.ndarray,
                    waypoints: jnp.ndarray,
                    radii: jnp.ndarray,
                    admm_config: Optional[ADMMConfig] = None,
                    ipm_config: Optional[IPMConfig] = None,
                    warmstart_values: Optional[jnp.ndarray] = None,
                    gate: float = 1e-2,
                    strict_gate: float = 1e-4,
                    scenario_block: int = 4,
                    tier0_snap: int = 0,
                    tier2_f64: bool = True,
                    interpret=None) -> AutoResult:
    """Batched tube-QCQP solve with Mosek-grade verdicts at every corridor
    width (ALL array args carry a leading batch axis).

    Pipeline: throughput ADMM on the full batch; scenarios with
    ``max_violation >= gate`` are gathered and re-solved by the warm-started
    plane-layout IPM (ipm_lanes.solve_qcqp_ipm_lanes).  Per-scenario
    verdicts follow the parity study's semantics
    (benchmarks/verdict_parity.py): feasible by exhibition
    (violation < ``strict_gate`` after escalation, < ``gate`` from the ADMM
    gate), infeasible by the IPM's static/Farkas certificate, else
    undetermined.

    Returns an AutoResult; ``solution`` rows of escalated scenarios are the
    IPM's, everything else the ADMM's.
    """
    from . import qcqp as qcqp_mod
    if admm_config is None:
        admm_config = ADMMConfig(rho=0.005, n_stages=1, n_iters=48,
                                 rho_tube_factor=0.125,
                                 rho_half_factor=0.125, use_pallas=True)
    if ipm_config is None:
        ipm_config = IPMConfig(n_iters=10, sigma_min=0.3, corrector=False)

    has_ws = warmstart_values is not None
    if tier0_snap:
        # Strict tier 0: ADMM + snap-only Gauss-Newton sweeps (pipelined,
        # one band factor per sweep) -- pulls the ADMM's ~1e-4-class
        # violations under the strict gate for the bulk of the batch at a
        # fraction of the full polish's cost; the IPM escalation below
        # handles the rest.
        ipm0 = IPMConfig(n_iters=0, snap_iters=tier0_snap, sigma_min=0.3,
                         corrector=False, pipelined=True)
        f0 = _cached_jit(
            ("tier0snap", id(structure), admm_config, ipm0, scenario_block,
             interpret, has_ws),
            lambda: (lambda df, t, w, r, ws=None:
                     ipm_lanes.solve_qcqp_polished_batch(
                         structure, df, t, w, r, admm_config=admm_config,
                         ipm_config=ipm0, warmstart_values=ws,
                         scenario_block=scenario_block,
                         interpret=interpret)))
        a = (f0(d_fixed, times, waypoints, radii, warmstart_values)
             if has_ws else f0(d_fixed, times, waypoints, radii))
    else:
        f0 = _cached_jit(
            ("tier0admm", id(structure), admm_config, scenario_block,
             has_ws),
            lambda: (lambda df, t, w, r, ws=None:
                     qcqp_mod.solve_qcqp_batch(
                         structure, df, t, w, r, config=admm_config,
                         warmstart_values=ws,
                         scenario_block=scenario_block)))
        a = (f0(d_fixed, times, waypoints, radii, warmstart_values)
             if has_ws else f0(d_fixed, times, waypoints, radii))
    bsz = int(a.cost.shape[0])
    a_viol = np.asarray(a.max_violation)
    gate_ok = a_viol < gate

    verdict = np.where(gate_ok, FEASIBLE, UNDETERMINED).astype(np.int8)
    escalated = ~gate_ok
    idx = np.nonzero(escalated)[0]
    n_esc = int(idx.size)
    if n_esc == 0:
        return AutoResult(solution=a, verdict=verdict,
                          escalated=escalated, n_escalated=0)

    # Fixed-shape escalation batch: pad the gathered indices to a bucketed
    # size by repeating the last failure (valid data; extra rows discarded).
    nb = _bucket(n_esc, scenario_block)
    idx_pad = np.concatenate([idx, np.full(nb - n_esc, idx[-1],
                                           dtype=idx.dtype)])
    # Tier 1 with the index gathers INSIDE the jitted program (one dispatch
    # instead of seven eager gathers over a possibly-remote device link).
    f1 = _cached_jit(
        ("tier1", id(structure), ipm_config, scenario_block, interpret, nb),
        lambda: (lambda df, t, w, r, x0_, lb, lh, ip:
                 ipm_lanes.solve_qcqp_ipm_lanes(
                     structure, df[ip], t[ip], w[ip], r[ip],
                     config=ipm_config, x0=x0_[ip], lam0_ball=lb[ip],
                     lam0_half=lh[ip], scenario_block=scenario_block,
                     interpret=interpret)))
    polished = f1(jnp.asarray(d_fixed), jnp.asarray(times),
                  jnp.asarray(waypoints), jnp.asarray(radii), a.d_free,
                  a.dual_ball, a.dual_half, jnp.asarray(idx_pad))

    # Tier 2: rows the f32 lanes polish leaves above the strict gate without
    # an infeasibility certificate -- on tight corridors the f32 endgame
    # stalls where an f64 interior point converges (measured: f64
    # ADMM-warm-started rows IPM reaches <1e-4 on every r=0.12 fixture the
    # f32 path leaves at ~1e-2).  Re-solve just those in f64
    # (ipm.solve_qcqp_polished, the parity study's ground-truth recipe, so
    # router verdicts match it by construction).  Requires jax_enable_x64;
    # without it the tier-1 verdict stands (conservative: UNDETERMINED rows
    # stay undetermined, never false-feasible).
    t1_viol = np.asarray(polished.max_violation)[:n_esc]
    t1_inf = np.asarray(polished.infeasible)[:n_esc]
    need2 = (t1_viol >= strict_gate) & ~t1_inf
    if tier2_f64 and need2.any() and jax.config.read("jax_enable_x64"):
        from .ipm import solve_qcqp_polished
        sub = np.nonzero(need2)[0]
        gidx = idx[sub]
        f64 = jnp.float64
        f2 = _cached_jit(
            ("tier2", id(structure), int(gidx.size)),
            lambda: jax.vmap(lambda d1, d2, d3, d4: solve_qcqp_polished(
                structure, d1, d2, d3, d4,
                ipm_config=IPMConfig(n_iters=30))))
        pol64 = f2(
            jnp.asarray(d_fixed, f64)[jnp.asarray(gidx)],
            jnp.asarray(times, f64)[jnp.asarray(gidx)],
            jnp.asarray(waypoints, f64)[jnp.asarray(gidx)],
            jnp.asarray(radii, f64)[jnp.asarray(gidx)])
        polished = QCQPSolution(*(
            (tf if pf is None or tf is None else
             jnp.asarray(tf).at[jnp.asarray(sub)].set(
                 jnp.asarray(pf, jnp.asarray(tf).dtype)))
            for tf, pf in zip(polished, pol64)))
        t1_viol = np.asarray(polished.max_violation)[:n_esc]
        t1_inf = np.asarray(polished.infeasible)[:n_esc]

    # Scatter the escalated rows back in ONE jitted program (keyed by the
    # bucket size, not n_esc): pad entries of idx_pad all point at the last
    # failure row, and `src` re-gathers that row's CURRENT (post-tier-2)
    # values for them, so the duplicate writes are identical and the
    # scatter's write order cannot matter.
    src = np.concatenate([np.arange(n_esc),
                          np.full(nb - n_esc, n_esc - 1)]).astype(np.int32)
    pair_mask = tuple(af is not None and pf is not None
                      for af, pf in zip(a, polished))
    f_m = _cached_jit(
        ("merge", nb, pair_mask, tuple(jnp.asarray(af).dtype.name
                                       if m else None
                                       for m, af in zip(pair_mask, a))),
        lambda: (lambda ip, sr, a_list, p_list: [
            af.at[ip].set(pf[sr].astype(af.dtype))
            for af, pf in zip(a_list, p_list)]))
    merged_fields = f_m(jnp.asarray(idx_pad), jnp.asarray(src),
                        [jnp.asarray(af) for m, af in zip(pair_mask, a)
                         if m],
                        [jnp.asarray(pf) for m, pf in zip(pair_mask,
                                                          polished) if m])
    it = iter(merged_fields)
    merged = QCQPSolution(*(next(it) if m else af
                            for m, af in zip(pair_mask, a)))

    v_esc = np.where(t1_viol < strict_gate, FEASIBLE,
                     np.where(t1_inf, INFEASIBLE, UNDETERMINED)).astype(
        np.int8)
    verdict[idx] = v_esc
    return AutoResult(solution=merged, verdict=verdict,
                      escalated=escalated, n_escalated=n_esc)


def solve_qcqp_strict(structure: ProblemStructure,
                      d_fixed: jnp.ndarray,
                      times: jnp.ndarray,
                      waypoints: jnp.ndarray,
                      radii: jnp.ndarray,
                      warmstart_values: Optional[jnp.ndarray] = None,
                      scenario_block: int = 4,
                      tier2_f64: bool = False,
                      interpret=None) -> AutoResult:
    """Mosek-grade strict-feasibility solve at router throughput.

    Tier 0: ADMM + snap-only Gauss-Newton sweeps (one band factor);
    tier 1: rows still >= 1e-4 escalate to the warm-started plane-layout
    IPM polish; optional tier 2 (f64 rows IPM) for the residue.  Verdicts
    are feasibility-by-exhibition at the 1e-4 strict gate -- the per-solve
    semantics of the reference's Mosek backend (qcqp_impl.h:709-788) with
    the polish cost paid ONLY by the scenarios that need it.
    """
    return solve_qcqp_auto(structure, d_fixed, times, waypoints, radii,
                           warmstart_values=warmstart_values,
                           gate=1e-4, strict_gate=1e-4,
                           scenario_block=scenario_block,
                           tier0_snap=3, tier2_f64=tier2_f64,
                           interpret=interpret)
