"""Strict-router variant sweep on the real chip (round-4 task #1: >=15k).

Measures the strict router end-to-end (host routing included;
solve_qcqp_auto at gate=strict_gate=1e-4 == solve_qcqp_strict) under
combinations of tier-0 snap count, tier-1 IPM schedule, and tier-1
scenario blocking, reporting solves/s + the strict-quality gate
(n<1e-4, p99, escalation count) for each.

Usage: python benchmarks/strict_variants.py [--batch=6144] [--reps=3]
       [--variants=v0,v1,...]
"""

import sys
import time

import numpy as np


def main():
    batch, reps = 6144, 3
    only = None
    for a in sys.argv:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
        if a.startswith("--variants="):
            only = set(a.split("=")[1].split(","))
    import jax
    sys.path.insert(0, "/root/repo")
    from bench import make_inputs
    from mav_tube_trajectory_generation_tpu.solver import auto
    from mav_tube_trajectory_generation_tpu.solver.ipm import IPMConfig

    (std, free, df_std, df_free, times, waypoints, radii,
     values) = make_inputs(10, batch)

    scan = dict(sigma_min=0.3, corrector=False)
    variants = {
        # name: (tier0_snap, tier1_block, tier1 IPMConfig, tier1_spec)
        "v0_base_it10s2_S4": (3, 4, IPMConfig(n_iters=10, **scan), 0),
        "v1_it10s2_S8":      (3, 8, IPMConfig(n_iters=10, **scan), 0),
        "v2_pipe_it10s2_S8": (3, 8, IPMConfig(n_iters=10, pipelined=True,
                                              **scan), 0),
        "v3_it6s2_S8":       (3, 8, IPMConfig(n_iters=6, **scan), 0),
        "v4_snap2_it10s2_S8": (2, 8, IPMConfig(n_iters=10, **scan), 0),
        "v5_snap4_it10s2_S8": (4, 8, IPMConfig(n_iters=10, **scan), 0),
        "v6_it8s3_S8":       (3, 8, IPMConfig(n_iters=8, snap_iters=3,
                                              **scan), 0),
        # Round-5: speculative in-program first restart on the worst slice
        # of the tier-1 bucket (saves the ~25 ms/dispatch restart round
        # trips), with cheaper tier-1 schedules whose quality loss the
        # speculation + host chain recover.
        "v7_snap2_spec64":   (2, 8, IPMConfig(n_iters=10, **scan), 64),
        "v8_snap2_spec128":  (2, 8, IPMConfig(n_iters=10, **scan), 128),
        "v9_it8s3_spec64":   (2, 8, IPMConfig(n_iters=8, snap_iters=3,
                                              **scan), 64),
        "v10_it6s2_spec128": (2, 8, IPMConfig(n_iters=6, **scan), 128),
        # Round-5 second wave: shave tier-0 instead (1 snap sweep / shorter
        # ADMM), letting the speculation + larger tier-1 bucket absorb the
        # extra escalations.
        "v11_snap1_spec128": (1, 8, IPMConfig(n_iters=10, **scan), 128),
        "v12_admm40_spec64": (2, 8, IPMConfig(n_iters=10, **scan), 64,
                              40),
        "v13_admm32_spec128": (2, 8, IPMConfig(n_iters=10, **scan), 128,
                               32),
        # Round-5 third wave: the winning combination -- shorter ADMM
        # (fewer escalations AND cheaper tier-0) x cheap it6 tier-1 whose
        # tail the spec restart recovers.
        "v14_admm40_it6_spec128": (2, 8, IPMConfig(n_iters=6, **scan), 128,
                                   40),
        "v15_admm32_it6_spec128": (2, 8, IPMConfig(n_iters=6, **scan), 128,
                                   32),
        "v16_admm40_it6_spec64": (2, 8, IPMConfig(n_iters=6, **scan), 64,
                                  40),
        # Round-5 fourth wave: how short can tier-1 go before the
        # speculation stops recovering the tail; deeper S-interleave.
        "v17_it4s2_spec256": (2, 8, IPMConfig(n_iters=4, **scan), 256),
        "v18_it5s2_spec128": (2, 8, IPMConfig(n_iters=5, **scan), 128),
        "v19_it6s2_S16":     (2, 16, IPMConfig(n_iters=6, **scan), 128),
    }

    from mav_tube_trajectory_generation_tpu.solver.qcqp import ADMMConfig
    for name, row in variants.items():
        if only and name not in only:
            continue
        snap0, t1b, cfg, spec = row[:4]
        admm_cfg = None
        if len(row) > 4:
            admm_cfg = ADMMConfig(rho=0.005, n_stages=1, n_iters=row[4],
                                  rho_tube_factor=0.125,
                                  rho_half_factor=0.125, use_pallas=True)
        t_wall = time.perf_counter()

        def strict_once():
            return auto.solve_qcqp_auto(
                free, df_free, times, waypoints, radii,
                warmstart_values=values, gate=1e-4, strict_gate=1e-4,
                scenario_block=4, tier0_snap=snap0, tier2_f64=False,
                tier1_block=t1b, ipm_config=cfg, tier1_spec=spec,
                admm_config=admm_cfg)

        try:
            res = strict_once()             # compile + warm
            t0 = time.perf_counter()
            for _ in range(reps):
                res = strict_once()
            dtp = (time.perf_counter() - t0) / reps
            violp = np.asarray(res.solution.max_violation)
            n_strict = int(np.sum(violp < 1e-4))
            tiers = np.bincount(res.tier, minlength=6).tolist()
            print(f"[{name:20s}] {dtp*1e3:7.1f} ms  "
                  f"{batch/dtp:8,.0f} solves/s  {n_strict}/{batch}<1e-4  "
                  f"p99 {float(np.percentile(violp, 99)):.1e}  "
                  f"esc {res.n_escalated}  tiers {tiers}  "
                  f"(wall {time.perf_counter()-t_wall:.0f}s)", flush=True)
        except Exception as e:              # noqa: BLE001
            print(f"[{name:20s}] FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
