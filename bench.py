"""Headline benchmark: trajectory solves/s/chip on the flagship config.

Config: 10-segment, 3-D, N=10 min-snap (BASELINE.json configs 1-2; target
>= 10,000 solves/s/chip).  Mirrors the shape sweep of the reference's
polynomial_timing_evaluation.cpp (K in {2, 10, 50, 100}) but megabatched:
one jitted program solves thousands of scenarios per dispatch, which is the
TPU-native replacement for the reference's one-solve-per-call loop.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s/chip", "vs_baseline": N/10000}

Once the QCQP stage lands the headline metric includes the tube-constrained
solve (QP+QCQP per BASELINE.json); until then it measures the linear QP.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mav_tube_trajectory_generation_tpu.solver import linear
    from mav_tube_trajectory_generation_tpu.solver import structure as sm
    from mav_tube_trajectory_generation_tpu.models.vertex import segment_times_nfabian

    dtype = jnp.float32  # TPU fast path; parity is gated separately in f64.

    k = 10
    structure = sm.make_structure(sm.standard_mask(k + 1, 10), dimension=3,
                                  n_coefficients=10)

    batch = 8192
    rng = np.random.RandomState(0)
    waypoints = np.cumsum(rng.uniform(0.5, 2.0, size=(batch, k + 1, 3)), axis=1)
    values = np.zeros((batch, k + 1, 5, 3), dtype=np.float32)
    values[:, :, 0, :] = waypoints
    times = np.asarray(segment_times_nfabian(waypoints, 3.0, 5.0),
                       dtype=np.float32)
    d_fixed = np.asarray(
        linear.extract_fixed_values(structure, jnp.asarray(values)))

    d_fixed = jnp.asarray(d_fixed, dtype)
    times = jnp.asarray(times, dtype)

    solve = jax.jit(jax.vmap(
        lambda df, t: linear.solve_linear(structure, df, t)))

    # Warmup / compile.
    out = solve(d_fixed, times)
    jax.block_until_ready(out)

    # Sanity: solutions must be finite.
    n_finite = int(jnp.sum(jnp.isfinite(out.cost)))
    if n_finite != batch:
        print(json.dumps({"metric": "trajectory_solves_per_s_per_chip",
                          "value": 0.0, "unit": "solves/s/chip",
                          "vs_baseline": 0.0,
                          "error": f"only {n_finite}/{batch} finite"}))
        return

    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = solve(d_fixed, times)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    solves_per_s = batch * n_iters / dt
    print(json.dumps({
        "metric": "trajectory_solves_per_s_per_chip (10-seg 3D min-snap QP)",
        "value": round(solves_per_s, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / 10000.0, 3),
    }))


if __name__ == "__main__":
    main()
