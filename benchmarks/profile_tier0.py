"""Device-time op breakdown of the strict router's tier-0 program
(ADMM + pipelined snap-only sweeps).

profile_strict.py showed tier-0 at ~300-344 ms/batch 6144 vs the bare
ADMM headline's ~116 ms -- is the extra ~200 ms the snap sweeps' Gram
evals, the XLA band factors, or glue?  This parses the jax.profiler trace
the same way profile_headline.py does.

Usage: python benchmarks/profile_tier0.py [--batch=6144]
"""

import collections
import glob
import gzip
import json
import sys


def main():
    batch = 6144
    for a in sys.argv:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
    import jax
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
    f0 = auto._cached_jit(
        ("tier0snap", free, admm, ipm0, 4, None, True),
        lambda: (lambda df, t, w, r, ws=None:
                 ipm_lanes.solve_qcqp_polished_batch(
                     free, df, t, w, r, admm_config=admm,
                     ipm_config=ipm0, warmstart_values=ws,
                     scenario_block=4, interpret=None)))
    out = f0(df_free, times, waypoints, radii, values)
    jax.block_until_ready(out)

    tracedir = "/tmp/tier0_trace"
    jax.profiler.start_trace(tracedir)
    for _ in range(2):
        out = f0(df_free, times, waypoints, radii, values)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(tracedir + "/**/*.trace.json.gz",
                             recursive=True))
    assert paths, "no trace found"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
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
        k = e["name"]
        by_op[k] += e["dur"]
        args = e.get("args", {}) or {}
        ln = args.get("long_name", "")
        if ln and k not in long_names:
            long_names[k] = ln
    parent = max(by_op.items(), key=lambda kv: kv[1])
    print(f"# parent {parent[0]}: {parent[1]/2e3:.1f} ms/run")
    groups = collections.defaultdict(float)
    for k, v in by_op.items():
        if k == parent[0]:
            continue
        base = k.split("(")[0].rstrip(".0123456789")
        groups[base] += v
    for k, v in sorted(groups.items(), key=lambda kv: -kv[1]):
        if v / 2e3 > 0.3:
            print(f"{v/2e3:8.2f} ms  {k}")
    print("# top individual ops:")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[1:30]:
        print(f"{v/2e3:8.2f} ms  {k}")
        ln = long_names.get(k, "")
        if ln:
            print(f"            {ln[:260]}")


if __name__ == "__main__":
    main()
