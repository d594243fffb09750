"""Diagnose the permanently-failed lanes of a randomized-obstacle
sweep (VERDICT r4 missing #5: 8/1024 lanes never converge and nobody
has shown whether they are solver failures or infeasible draws).

Reads shard statuses from a finished sweep directory, deterministically
regenerates each failed lane's spec (same generator + seed arithmetic
as bench/run_sweep.py), and for each:

  * re-solves with the f64 CPU oracle configuration (the Ipopt
    stand-in) from the lane's own lattice warm start;
  * if that fails, re-solves seeded from the *converged f64 solution
    of its nearest same-layout neighbour* (the rescue move, at oracle
    precision);
  * reports the exact-SAT goal clearance and lattice-planner
    reachability as feasibility evidence.

Verdict per lane: "solver_gap" (f64 converges — the f32 pipeline's
rescue should have gotten it), "oracle_fails_too" (likely a hard/
infeasible draw; see the clearance columns), with the full layout draw
logged either way.

    python tools/diagnose_failed_lanes.py --out /tmp/obca_sweep_randobs \
        [--batch 1024 --shard-size 128 --layouts 8 --seed 0 --N 80]

Writes bench/out/failed_lane_diagnosis.json.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/obca_sweep_randobs")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--shard-size", type=int, default=128)
    ap.add_argument("--layouts", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--N", type=int, default=80)
    ap.add_argument("--max-iter", type=int, default=300)
    args = ap.parse_args()

    from obca_tpu import geometry
    from obca_tpu.solver import ipm
    from obca_tpu.spec import (SolverConfig,
                               randomized_reverse_parking_specs)
    from obca_tpu.warmstart import geometric, lattice

    n_shards = -(-args.batch // args.shard_size)
    statuses = []
    for i in range(n_shards):
        z = np.load(os.path.join(args.out, f"shard_{i:04d}.npz"))
        statuses.append(np.asarray(z["status"]))
    status = np.concatenate(statuses)
    failed = np.flatnonzero(status != 0)
    print(f"{failed.size} failed lanes of {status.size}", flush=True)

    cfg = SolverConfig(max_iter=args.max_iter)
    shard_cache = {}

    def get_shard(si):
        if si not in shard_cache:
            shard_cache[si] = randomized_reverse_parking_specs(
                args.shard_size, n_layouts=args.layouts,
                seed=args.seed + si, N=args.N, Ts=24.0 / args.N,
                dtype=jnp.float64)
        return shard_cache[si]

    solve1 = jax.jit(lambda sp, w: ipm.solve_single(sp, cfg, w))
    cfg_resc = dataclasses.replace(
        cfg, mu_init=jnp.asarray(1e-5, jnp.float64))
    solve_seeded = jax.jit(
        lambda sp, w, d: ipm.solve_single(sp, cfg_resc, w, duals0=d))

    rows = []
    for lane in failed:
        lane = int(lane)
        si, li = divmod(lane, args.shard_size)
        specs, layouts, group = get_shard(si)
        sp = jax.tree.map(lambda a: a[lane % args.shard_size], specs)

        # Feasibility evidence: exact SAT clearance of the goal pose,
        # and of the start pose.
        def clearance(x):
            return float(jnp.min(geometry.ego_clearance_exact(
                x, sp.ego_g, sp.obstacles)))

        goal_clr = clearance(sp.xF)
        start_clr = clearance(sp.x0)

        t0 = time.perf_counter()
        W0 = geometric.lattice_warm_start(sp, dtype=jnp.float64)
        res = jax.block_until_ready(solve1(sp, W0))
        oracle_status = int(res.status)
        oracle_iters = int(res.iters)
        rescue_status = None
        if oracle_status != 0:
            # Oracle rescue: seed from the nearest CONVERGED
            # same-layout neighbour's f32 sweep solution (cast to
            # f64) — the same donor move the production rescue makes,
            # at oracle precision.
            z = np.load(os.path.join(args.out, f"shard_{si:04d}.npz"))
            li0 = lane % args.shard_size
            g0 = li0 // group * group
            cand = [lj for lj in range(g0, g0 + group)
                    if lj != li0 and z["status"][lj] == 0]
            if cand:
                x0s = np.asarray(specs.x0)
                dj = min(cand, key=lambda lj: float(
                    ((x0s[lj] - x0s[li0]) ** 2).sum()))
                W_seed = jnp.asarray(z["W"][dj], jnp.float64)
                duals = ipm.DualState(
                    nu=jnp.asarray(z["nu"][dj], jnp.float64),
                    s=jnp.asarray(z["s"][dj], jnp.float64),
                    zL=jnp.asarray(z["zL"][dj], jnp.float64),
                    zU=jnp.asarray(z["zU"][dj], jnp.float64))
                rr = jax.block_until_ready(
                    solve_seeded(sp, W_seed, duals))
                rescue_status = int(rr.status)
        wall = time.perf_counter() - t0

        f64_ok = oracle_status == 0 or rescue_status == 0
        row = dict(
            lane=lane, shard=si, shard_seed=args.seed + si,
            x0=[round(float(v), 4) for v in sp.x0],
            xF=[round(float(v), 4) for v in sp.xF],
            goal_clearance=round(goal_clr, 4),
            start_clearance=round(start_clr, 4),
            oracle_status=oracle_status, oracle_iters=oracle_iters,
            oracle_rescue_status=rescue_status,
            verdict="solver_gap" if f64_ok else "oracle_fails_too",
            wall_s=round(wall, 1),
        )
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = dict(
        sweep_dir=args.out, n_failed=int(failed.size),
        n_total=int(status.size),
        n_solver_gap=sum(r["verdict"] == "solver_gap" for r in rows),
        lanes=rows,
    )
    path = os.path.join(REPO, "bench", "out",
                        "failed_lane_diagnosis.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
