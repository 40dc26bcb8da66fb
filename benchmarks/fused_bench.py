"""Fused whole-IPM kernel benchmark: the Mosek-grade path's round-3 lever.

Compares solve_qcqp_polished_batch (ADMM + plane-layout IPM polish) between
the round-2 scan path (per Newton step: one eval kernel + ~80 XLA band-
factor dispatches + a matvec kernel) and the fused kernel
(ops/ipm_kernel.ipm_solve_fused: the whole Newton scan + snap in ONE
dispatch, G^T/Gram/factors VMEM-resident), across scenario blocking S and
snap-sweep counts.  Reports solves/s, the strict-gate census
(n < 1e-4), and the violation tail.

Usage: python benchmarks/fused_bench.py [--batch=6144] [--quick]
Runs on whatever backend jax selects (the driver's axon TPU by default).
Each (fused, S, snap, n_iters) tuple is a separate Mosaic compile -- slow
first run over the remote-compile tunnel, cached after.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    batch = 6144
    quick = "--quick" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
    if quick:
        batch = 512
    import jax
    import jax.numpy as jnp
    import bench
    from mav_tube_trajectory_generation_tpu.solver import ipm, ipm_lanes

    k = 10
    (_, free, _, df, times, waypoints, radii, values) = bench.make_inputs(
        k, batch, seed=3)

    def run(tag, ipm_cfg, s_blk, n_iters_time=5):
        def f(d1, d2, d3, d4, d5):
            sol = ipm_lanes.solve_qcqp_polished_batch(
                free, d1, d2, d3, d4, ipm_config=ipm_cfg,
                warmstart_values=d5, scenario_block=s_blk)
            return sol.max_violation, sol.cost
        fj = jax.jit(f)
        args = (df, times, waypoints, radii, values)
        t0 = time.perf_counter()
        out = fj(*args)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n_iters_time):
            out = fj(*args)
        # Host roundtrip for honest timing (CLAUDE.md).
        _ = float(jnp.sum(out[0]))
        dt = (time.perf_counter() - t0) / n_iters_time
        viol = np.asarray(out[0])
        n_strict = int(np.sum(viol < 1e-4))
        print(f"[fused_bench] {tag}: {batch / dt:,.0f} solves/s "
              f"({dt * 1e3:.1f} ms/batch {batch}); strict<1e-4 "
              f"{n_strict}/{batch}; med {np.median(viol):.2e} "
              f"p99 {np.percentile(viol, 99):.2e} max {viol.max():.2e} "
              f"(compile {compile_s:.0f}s)", flush=True)
        return batch / dt, n_strict

    base = dict(sigma_min=0.3, corrector=False)
    # Tier-0 candidates for the strict router: few Newton steps + snaps.
    run("pipe it3 snap2",
        ipm.IPMConfig(n_iters=3, snap_iters=2, pipelined=True, **base), 4)
    run("pipe it4 snap2",
        ipm.IPMConfig(n_iters=4, snap_iters=2, pipelined=True, **base), 4)
    run("pipe it10 snap2 (full, fresh snap factors)",
        ipm.IPMConfig(n_iters=10, pipelined=True, **base), 4)
    run("scan S=4 it10 snap2", ipm.IPMConfig(n_iters=10, **base), 4)


if __name__ == "__main__":
    main()
