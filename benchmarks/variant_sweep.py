"""One-off variant sweep for the fused-kernel headline (each variant is a
fresh XLA program -> remote compile; run in the background).

Usage: python benchmarks/variant_sweep.py S=8 B=8192 ...
Each arg "S=<block> B=<batch>" is one variant; prints solves/s for each.
"""

import sys
import time

import numpy as np


def run_variant(batch, block):
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from bench import make_inputs
    from mav_tube_trajectory_generation_tpu.solver import qcqp

    (std, free, df_std, df_free, times, waypoints, radii,
     values) = make_inputs(10, batch)
    admm = qcqp.ADMMConfig(rho=0.005, n_stages=1, n_iters=48,
                           rho_tube_factor=0.125, rho_half_factor=0.125,
                           use_pallas=True)

    def full_solve(df_free_b, times_b, waypoints_b, radii_b, values_b):
        con = qcqp.solve_qcqp_batch(free, df_free_b, times_b, waypoints_b,
                                    radii_b, config=admm,
                                    warmstart_values=values_b,
                                    scenario_block=block)
        return con.cost, con.max_violation, con.converged

    solve = jax.jit(full_solve)
    try:
        out = solve(df_free, times, waypoints, radii, values)
        jax.block_until_ready(out)
    except Exception as e:  # OOM / Mosaic failures: report, keep sweeping
        print(f"[sweep] B={batch} S={block}: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(5):
        out = solve(df_free, times, waypoints, radii, values)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    cost, viol, conv = out
    n_ok = int(jnp.sum(jnp.isfinite(cost) & (viol < 1e-2)))
    print(f"[sweep] B={batch} S={block}: {dt*1e3:.1f} ms/batch, "
          f"{batch/dt:,.0f} solves/s, {n_ok}/{batch} feasible, "
          f"median viol {float(jnp.median(viol)):.2e}", flush=True)


def main():
    variants = []
    for a in sys.argv[1:]:
        parts = dict(p.split("=") for p in a.split(","))
        variants.append((int(parts.get("B", 6144)), int(parts.get("S", 4))))
    if not variants:
        variants = [(6144, 8), (8192, 4)]
    for batch, block in variants:
        run_variant(batch, block)


if __name__ == "__main__":
    main()
