"""Profile the headline QP+QCQP batch and print a device-time op breakdown.

Usage: python benchmarks/profile_headline.py [--batch=6144]
Parses the jax.profiler trace (dedup by process_name per CLAUDE.md) and
prints the top ops by total device time.
"""

import glob
import gzip
import json
import sys
import collections

import numpy as np


def main():
    batch = 6144
    band_gram = "xla"
    for a in sys.argv:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
        if a.startswith("--bandgram="):
            band_gram = a.split("=")[1]
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from bench import make_inputs
    from mav_tube_trajectory_generation_tpu.solver import qcqp

    (std, free, df_std, df_free, times, waypoints, radii,
     values) = make_inputs(10, batch)
    admm = qcqp.ADMMConfig(rho=0.005, n_stages=1, n_iters=48,
                           rho_tube_factor=0.125, rho_half_factor=0.125,
                           use_pallas=True, band_gram=band_gram)

    def full_solve(df_free_b, times_b, waypoints_b, radii_b, values_b):
        con = qcqp.solve_qcqp_batch(free, df_free_b, times_b, waypoints_b,
                                    radii_b, config=admm,
                                    warmstart_values=values_b,
                                    scenario_block=4)
        return con.cost, con.max_violation, con.converged

    solve = jax.jit(full_solve)
    out = solve(df_free, times, waypoints, radii, values)
    jax.block_until_ready(out)

    tracedir = "/tmp/headline_trace"
    jax.profiler.start_trace(tracedir)
    for _ in range(2):
        out = solve(df_free, times, waypoints, radii, values)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(tracedir + "/**/*.trace.json.gz",
                             recursive=True))
    assert paths, "no trace found"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # map pid -> process name; keep one device process only (dedup lanes)
    pnames = {e["pid"]: e["args"].get("name", "")
              for e in events if e.get("name") == "process_name"}
    dev_pids = sorted(p for p, n in pnames.items()
                      if "TPU" in n or "/device:" in n or "Chip" in n)
    by_op = collections.defaultdict(float)
    long_names = {}
    seen_pid = set()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid = e.get("pid")
        if dev_pids and pid not in dev_pids:
            continue
        name = pnames.get(pid, "")
        key = (name, e.get("tid"))
        args = e.get("args", {}) or {}
        long = args.get("long_name", "") or args.get("hlo_op", "")
        cat = args.get("custom_call_target", "")
        label = e["name"]
        if cat:
            label = f"{label} [{cat}]"
        by_op[label] += e["dur"]
        if long and label not in long_names:
            long_names[label] = long
        seen_pid.add(name)
    total = sum(by_op.values())
    print(f"# device processes: {sorted(seen_pid)}")
    print(f"# total device-time (2 runs, all lanes): {total/1e3:.1f} ms")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v/2e3:9.2f} ms  {k}")
        ln = long_names.get(k, "")
        if ln:
            print(f"              {ln[:600]}")


if __name__ == "__main__":
    main()
