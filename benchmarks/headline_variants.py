"""Headline-program variant sweep on the real chip.

Round-4 overhead attack (VERDICT task #2): measures the full QP+QCQP
headline under ADMMConfig variants -- band_gram backends first -- printing
ms/batch, solves/s, and the quality gate (feasible count + median
violation) for each, so layout experiments are accepted/rejected on both
axes.

Usage: python benchmarks/headline_variants.py [--batch=6144]
       [--variants=xla,pallas,pallas_block] [--reps=5]
"""

import sys
import time

import numpy as np


def main():
    batch, reps = 6144, 5
    variants = ["xla", "pallas", "pallas_block"]
    for a in sys.argv:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
        if a.startswith("--variants="):
            variants = a.split("=")[1].split(",")
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from bench import make_inputs, time_fn
    from mav_tube_trajectory_generation_tpu.solver import qcqp

    (std, free, df_std, df_free, times, waypoints, radii,
     values) = make_inputs(10, batch)

    for bg in variants:
        # "ew" = round-5 in-kernel G^T assembly (gt never exists in HBM);
        # other names select the Gram-band backend with XLA gt assembly.
        kw = ({"gt_assembly": "kernel"} if bg == "ew"
              else {"band_gram": bg})
        admm = qcqp.ADMMConfig(rho=0.005, n_stages=1, n_iters=48,
                               rho_tube_factor=0.125,
                               rho_half_factor=0.125, use_pallas=True,
                               **kw)

        def full_solve(df_free_b, times_b, waypoints_b, radii_b, values_b):
            con = qcqp.solve_qcqp_batch(free, df_free_b, times_b,
                                        waypoints_b, radii_b, config=admm,
                                        warmstart_values=values_b,
                                        scenario_block=4)
            return con.cost, con.max_violation, con.converged

        solve = jax.jit(full_solve)
        t_c0 = time.perf_counter()
        dt, out = time_fn(solve, (df_free, times, waypoints, radii, values),
                          n_iters=reps)
        cost, viol, conv = out
        n_ok = int(jnp.sum(jnp.isfinite(cost) & (viol < 1e-2)))
        print(f"[variant {bg:13s}] {dt*1e3:7.1f} ms/batch "
              f"{batch/dt:10,.0f} solves/s  {n_ok}/{batch} feasible  "
              f"med viol {float(jnp.median(viol)):.2e}  "
              f"(compile+run wall {time.perf_counter()-t_c0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
