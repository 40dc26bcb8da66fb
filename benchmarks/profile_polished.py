"""Profile the IPM polish phase alone (warm-started from a separately-run
ADMM batch) and print a device-time op breakdown.

Usage: python benchmarks/profile_polished.py [--batch=6144] [--ipm-iters=12]
Parses the jax.profiler trace (dedup by process_name per CLAUDE.md).
"""

import collections
import glob
import gzip
import json
import sys

sys.path.insert(0, ".")


def main():
    batch, n_ipm = 6144, 12
    for a in sys.argv:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
        if a.startswith("--ipm-iters="):
            n_ipm = int(a.split("=")[1])
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from bench import make_inputs
    from mav_tube_trajectory_generation_tpu.solver import ipm, qcqp

    (std, free, df_std, df_free, times, waypoints, radii,
     values) = make_inputs(10, batch)
    admm = qcqp.ADMMConfig(rho=0.005, n_stages=1, n_iters=48,
                           rho_tube_factor=0.125, rho_half_factor=0.125,
                           use_pallas=jax.default_backend() != "cpu")
    a = jax.jit(lambda *xs: qcqp.solve_qcqp_batch(
        free, *xs, config=admm, scenario_block=4))(
        df_free, times, waypoints, radii)
    jax.block_until_ready(a.d_free)

    ipm_cfg = ipm.IPMConfig(n_iters=n_ipm)

    def polish(df, t, w, r, x0, lb, lh):
        p = jax.vmap(lambda d1, d2, d3, d4, d5, d6, d7: ipm.solve_qcqp_ipm(
            free, d1, d2, d3, d4, config=ipm_cfg, x0=d5,
            lam0_ball=d6, lam0_half=d7))(df, t, w, r, x0, lb, lh)
        return p.cost, p.max_violation

    args = (df_free, times, waypoints, radii, a.d_free, a.dual_ball,
            a.dual_half)
    f = jax.jit(polish)
    out = f(*args)
    jax.block_until_ready(out)
    import time
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"[profile] IPM polish alone: {dt*1e3:.1f} ms/batch {batch} "
          f"({n_ipm} steps; {dt*1e3/n_ipm:.1f} ms/step)", flush=True)

    tracedir = "/tmp/polished_trace"
    jax.profiler.start_trace(tracedir)
    for _ in range(2):
        out = f(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(tracedir + "/**/*.trace.json.gz",
                             recursive=True))
    assert paths, "no trace found"
    with gzip.open(paths[-1], "rt") as f2:
        trace = json.load(f2)
    events = trace["traceEvents"]
    pnames = {e["pid"]: e["args"].get("name", "")
              for e in events if e.get("name") == "process_name"}
    dev_pids = sorted(p for p, n in pnames.items()
                      if "TPU" in n or "/device:" in n or "Chip" in n)
    by_op = collections.defaultdict(float)
    long_names = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid = e.get("pid")
        if dev_pids and pid not in dev_pids:
            continue
        args_d = e.get("args", {}) or {}
        long = args_d.get("long_name", "") or args_d.get("hlo_op", "")
        cat = args_d.get("custom_call_target", "")
        label = e["name"]
        if cat:
            label = f"{label} [{cat}]"
        by_op[label] += e["dur"]
        if long and label not in long_names:
            long_names[label] = long
    total = sum(by_op.values())
    print(f"# total device-time (2 runs, all lanes): {total/1e3:.1f} ms")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{v/2e3:9.2f} ms  {k}")
        ln = long_names.get(k, "")
        if ln:
            print(f"              {ln[:400]}")


if __name__ == "__main__":
    main()
