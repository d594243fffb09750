"""Batched randomized scenario sweep (BASELINE config 4: 1024 scenarios),
sharded over the local device mesh, with shard-level checkpoint/resume.

    python bench/run_sweep.py --batch 1024 --shard-size 128 \
        --out /tmp/sweep --config mixed

Each shard's results are written to ``<out>/shard_{i:04d}.npz`` as soon
as it finishes; re-running skips completed shards (SURVEY.md §5
checkpoint/resume — solves are stateless, so resume = skip).  Metrics
stream to ``<out>/metrics.jsonl``.
"""

import argparse
import os
import time

import _common
import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--shard-size", type=int, default=128)
    ap.add_argument("--N", type=int, default=80)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--config", choices=["f64", "mixed", "f32"],
                    default="f32")
    ap.add_argument("--max-iter", type=int, default=70)
    ap.add_argument("--out", default="/tmp/obca_sweep")
    args = ap.parse_args()

    from obca_tpu.parallel import mesh as mesh_mod
    from obca_tpu.solver import ipm
    from obca_tpu.spec import reverse_parking_spec
    from obca_tpu.warmstart import geometric, lattice

    os.makedirs(args.out, exist_ok=True)
    log = _common.jsonl_writer(os.path.join(args.out, "metrics.jsonl"))

    cfg = _common.solver_config(args.config, args.max_iter)
    base = reverse_parking_spec(N=args.N, Ts=24.0 / args.N,
                                dtype=cfg.dtype)
    mesh = mesh_mod.scenario_mesh()
    n_dev = len(mesh.devices.ravel())
    shard_size = max(args.shard_size // n_dev * n_dev, n_dev)

    # The lattice planner field depends only on (obstacles, goal):
    # computed once on the host spec, shared by every scenario.
    field = lattice.plan_field(base, lattice.LatticeConfig.for_spec(base))

    def pipeline(specs):
        W0 = jax.vmap(
            lambda sp: geometric.lattice_warm_start(sp, dtype=cfg.dtype,
                                                    field=field)
        )(specs)
        # Neighbor-seeded rescue pass for bad-basin lanes.
        return ipm.solve_batch_rescued(specs, cfg, W0)

    n_shards = -(-args.batch // shard_size)
    done = total_conv = 0
    # One cached jitted runner for every shard (shards share shapes; a
    # per-shard jit closure would re-trace each time — ADVICE r2).
    runner = mesh_mod.make_sharded_solver(pipeline, mesh)
    t_start = time.perf_counter()
    for i in range(n_shards):
        path = os.path.join(args.out, f"shard_{i:04d}.npz")
        if os.path.exists(path):
            done += 1
            continue
        specs = _common.scenario_batch(base, shard_size,
                                       seed=args.seed + i)
        t0 = time.perf_counter()
        res, metrics = runner(specs)
        jax.block_until_ready(res.U)
        dt = time.perf_counter() - t0
        summary = _common.result_summary(res)
        total_conv += summary["converged"]
        np.savez(
            path,
            X=np.asarray(res.X), U=np.asarray(res.U),
            status=np.asarray(res.status), iters=np.asarray(res.iters),
            err=np.asarray(res.err), obj=np.asarray(res.obj),
        )
        log(dict(shard=i, wall_s=round(dt, 3),
                 solves_per_s=round(shard_size / dt, 2), **summary))
        done += 1

    wall = time.perf_counter() - t_start
    log(dict(event="sweep_done", shards=done,
             batch=n_shards * shard_size, wall_s=round(wall, 2)))


if __name__ == "__main__":
    main()
