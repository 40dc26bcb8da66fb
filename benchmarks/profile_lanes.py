"""Device-time op breakdown of the lanes polished path (ADMM + plane-layout
IPM + snap) at the flagship batch.  Mirrors profile_polished.py.

Usage: python benchmarks/profile_lanes.py [--batch=6144]
"""

import collections
import glob
import gzip
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    batch = 6144
    for a in sys.argv:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
    import jax
    from bench import make_inputs
    from mav_tube_trajectory_generation_tpu.solver import ipm_lanes, qcqp

    (std, free, df_std, df_free, times, waypoints, radii,
     values) = make_inputs(10, batch)
    admm = qcqp.ADMMConfig(rho=0.005, n_stages=1, n_iters=48,
                           rho_tube_factor=0.125, rho_half_factor=0.125,
                           use_pallas=True)

    def full_solve(df_free_b, times_b, waypoints_b, radii_b, values_b):
        pol = ipm_lanes.solve_qcqp_polished_batch(
            free, df_free_b, times_b, waypoints_b, radii_b,
            admm_config=admm, warmstart_values=values_b, scenario_block=4)
        return pol.cost, pol.max_violation, pol.cost

    f = jax.jit(full_solve)
    args = (df_free, times, waypoints, radii, values)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"[profile] lanes polished: {dt*1e3:.1f} ms/batch {batch}",
          flush=True)

    tracedir = "/tmp/lanes_trace"
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
        if dev_pids and e.get("pid") not in dev_pids:
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
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v/2e3:9.2f} ms  {k}")
        ln = long_names.get(k, "")
        if ln:
            print(f"              {ln[:350]}")


if __name__ == "__main__":
    main()
