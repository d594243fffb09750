"""Aggregate sweep shards + metrics into a single report.

    python bench/report.py /tmp/obca_sweep
"""

import glob
import json
import os
import sys

import numpy as np


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/obca_sweep"
    shards = sorted(glob.glob(os.path.join(out, "shard_*.npz")))
    if not shards:
        print(json.dumps({"error": f"no shards under {out}"}))
        return
    status, iters, err = [], [], []
    for p in shards:
        z = np.load(p)
        status.append(z["status"])
        iters.append(z["iters"])
        err.append(z["err"])
    status = np.concatenate(status)
    iters = np.concatenate(iters)
    err = np.concatenate(err).astype(np.float64)

    wall = None
    rescue_wall = 0.0
    rescue = {}
    mpath = os.path.join(out, "metrics.jsonl")
    if os.path.exists(mpath):
        recs = [json.loads(l) for l in open(mpath)]
        # Multi-pass sweeps (run_sweep --passes N) mark each pass; the
        # report covers the LAST pass — warm-executable steady state.
        starts = [i for i, r in enumerate(recs)
                  if r.get("event") == "pass_start"]
        if starts:
            recs = recs[starts[-1]:]
        solve_recs = [r for r in recs if "wall_s" in r and "shard" in r]
        # The global rescue pass is part of the sweep's solve cost.
        rescue_recs = [r for r in recs if r.get("event") == "rescue"]
        rescue_wall = sum(r["wall_s"] for r in rescue_recs)
        if rescue_recs:
            rescue = {
                "rescue_wall_s": round(rescue_wall, 3),
                "rescue_rounds": len(rescue_recs),
                # Rounds re-report the shrinking failure set; the
                # sweep-level figures are round 0's failures and the
                # total recoveries.
                "rescue_n_failed": rescue_recs[0]["n_failed"],
                "rescue_n_recovered": sum(r["n_recovered"]
                                          for r in rescue_recs),
            }
        wall = sum(r["wall_s"] for r in solve_recs) + rescue_wall

    rep = {
        "shards": len(shards),
        "scenarios": int(status.size),
        "converged": int((status == 0).sum()),
        "convergence_rate": float((status == 0).mean()),
        "iters_p50": float(np.percentile(iters, 50)),
        "iters_p95": float(np.percentile(iters, 95)),
        "kkt_err_max_converged": float(err[status == 0].max())
        if (status == 0).any() else None,
        "iters_max": int(iters.max()),
    }
    rep.update(rescue)
    if wall:
        rep["total_solve_wall_s"] = round(wall, 2)
        rep["solves_per_s"] = round(status.size / wall, 2)
        # Steady-state throughput: the first shard pays the XLA
        # compile; later shards reuse the cached executable.  The
        # rescue pass is amortized into the steady figure (it runs
        # once per sweep, over all shards' failures).
        if len(solve_recs) > 1:
            tail = solve_recs[1:]
            tail_n = sum(r["n"] for r in tail)
            tail_w = sum(r["wall_s"] for r in tail) + rescue_wall
            rep["solves_per_s_steady"] = round(tail_n / tail_w, 2)
            rep["first_shard_compile_wall_s"] = round(
                solve_recs[0]["wall_s"], 2)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
