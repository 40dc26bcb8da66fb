"""Phase-level timing of the strict router (solver/auto.solve_qcqp_strict).

Round-3 BENCH: 12.2k solves/s = ~503 ms/batch 6144, but tier-0 alone is
~253 ms and the tier-1 IPM bucket ~105-150 ms -- where do the remaining
~100-150 ms go?  This harness times each phase separately (device work
block_until_ready'd, host sections wall-clocked) so the round-4 throughput
work attacks the right phase.

Usage: python benchmarks/profile_strict.py [--batch=6144] [--reps=3]
"""

import sys
import time

import numpy as np


def main():
    batch, reps = 6144, 3
    for a in sys.argv:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from bench import make_inputs
    from mav_tube_trajectory_generation_tpu.solver import auto, ipm_lanes
    from mav_tube_trajectory_generation_tpu.solver.ipm import IPMConfig
    from mav_tube_trajectory_generation_tpu.solver.qcqp import ADMMConfig

    (std, free, df_std, df_free, times, waypoints, radii,
     values) = make_inputs(10, batch)

    admm = ADMMConfig(rho=0.005, n_stages=1, n_iters=48,
                      rho_tube_factor=0.125, rho_half_factor=0.125,
                      use_pallas=True)
    ipm0 = IPMConfig(n_iters=0, snap_iters=3, sigma_min=0.3,
                     corrector=False, pipelined=True)
    ipm1 = IPMConfig(n_iters=10, sigma_min=0.3, corrector=False)

    # --- Phase A: tier-0 (ADMM + snap-only pipelined polish) -------------
    f0 = auto._cached_jit(
        ("tier0snap", free, admm, ipm0, 4, None, True),
        lambda: (lambda df, t, w, r, ws=None:
                 ipm_lanes.solve_qcqp_polished_batch(
                     free, df, t, w, r, admm_config=admm,
                     ipm_config=ipm0, warmstart_values=ws,
                     scenario_block=4, interpret=None)))
    a = f0(df_free, times, waypoints, radii, values)
    jax.block_until_ready(a)
    t0 = time.perf_counter()
    for _ in range(reps):
        a = f0(df_free, times, waypoints, radii, values)
        jax.block_until_ready(a)
    t_tier0 = (time.perf_counter() - t0) / reps
    print(f"tier0 (ADMM48 + snap3): {t_tier0*1e3:8.1f} ms", flush=True)

    # --- Phase B: gate pull + host routing (mask sync) -------------------
    t0 = time.perf_counter()
    for _ in range(reps):
        a_viol = np.asarray(a.max_violation)
        gate_ok = a_viol < 1e-4
        idx = np.nonzero(~gate_ok)[0]
    t_gate = (time.perf_counter() - t0) / reps
    n_esc = int(idx.size)
    nb = auto._bucket(n_esc, 4)
    print(f"gate pull + nonzero:    {t_gate*1e3:8.1f} ms "
          f"({n_esc} escalated -> bucket {nb})", flush=True)

    # --- Phase C: tier-1 IPM on the escalated bucket ---------------------
    idx_pad = np.concatenate([idx, np.full(nb - n_esc, idx[-1],
                                           dtype=idx.dtype)])
    f1 = auto._cached_jit(
        ("tier1", free, ipm1, 4, None, nb),
        lambda: (lambda df, t, w, r, x0_, lb, lh, ip:
                 ipm_lanes.solve_qcqp_ipm_lanes(
                     free, df[ip], t[ip], w[ip], r[ip],
                     config=ipm1, x0=x0_[ip], lam0_ball=lb[ip],
                     lam0_half=lh[ip], scenario_block=4,
                     interpret=None)))
    args1 = (df_free, times, waypoints, radii, a.d_free,
             a.dual_ball, a.dual_half, jnp.asarray(idx_pad))
    polished = f1(*args1)
    jax.block_until_ready(polished)
    t0 = time.perf_counter()
    for _ in range(reps):
        polished = f1(*args1)
        jax.block_until_ready(polished)
    t_tier1 = (time.perf_counter() - t0) / reps
    print(f"tier1 (IPM it10, {nb:4d}): {t_tier1*1e3:8.1f} ms", flush=True)

    # --- Phase D: tier-1 verdict pull ------------------------------------
    t0 = time.perf_counter()
    for _ in range(reps):
        t1_viol = np.asarray(polished.max_violation)[:n_esc]
        t1_inf = np.asarray(polished.infeasible)[:n_esc]
    t_pull = (time.perf_counter() - t0) / reps
    print(f"tier1 verdict pull:     {t_pull*1e3:8.1f} ms", flush=True)

    # --- Phase E: scatter-merge ------------------------------------------
    src = np.concatenate([np.arange(n_esc),
                          np.full(nb - n_esc, n_esc - 1)]).astype(np.int32)
    pair_mask = tuple(af is not None and pf is not None
                      for af, pf in zip(a, polished))
    f_m = auto._cached_jit(
        ("merge", nb, pair_mask, tuple(jnp.asarray(af).dtype.name
                                       if m else None
                                       for m, af in zip(pair_mask, a))),
        lambda: (lambda ip, sr, a_list, p_list: [
            af.at[ip].set(pf[sr].astype(af.dtype))
            for af, pf in zip(a_list, p_list)]))
    margs = (jnp.asarray(idx_pad), jnp.asarray(src),
             [jnp.asarray(af) for m, af in zip(pair_mask, a) if m],
             [jnp.asarray(pf) for m, pf in zip(pair_mask, polished) if m])
    out = f_m(*margs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f_m(*margs)
        jax.block_until_ready(out)
    t_merge = (time.perf_counter() - t0) / reps
    print(f"scatter-merge:          {t_merge*1e3:8.1f} ms", flush=True)

    # --- End-to-end for cross-check --------------------------------------
    def strict_once():
        return auto.solve_qcqp_strict(free, df_free, times, waypoints,
                                      radii, warmstart_values=values,
                                      scenario_block=4)
    res = strict_once()
    t0 = time.perf_counter()
    for _ in range(reps):
        res = strict_once()
    t_e2e = (time.perf_counter() - t0) / reps
    tot = t_tier0 + t_gate + t_tier1 + t_pull + t_merge
    print(f"sum of phases:          {tot*1e3:8.1f} ms", flush=True)
    print(f"end-to-end strict:      {t_e2e*1e3:8.1f} ms "
          f"({batch/t_e2e:,.0f} solves/s; {res.n_escalated} escalated)",
          flush=True)


if __name__ == "__main__":
    main()
