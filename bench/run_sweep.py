"""Batched randomized scenario sweep (BASELINE config 4: 1024 scenarios
with randomized initial poses AND obstacle layouts), sharded over the
local device mesh, with shard-level checkpoint/resume.

    python bench/run_sweep.py --batch 1024 --shard-size 128 \
        --out /tmp/sweep --config f32

Each shard's results are written to ``<out>/shard_{i:04d}.npz`` as soon
as it finishes; re-running skips completed shards (SURVEY.md §5
checkpoint/resume — solves are stateless, so resume = skip).  Metrics
stream to ``<out>/metrics.jsonl``.

Structure (r4 redesign): shards run the *pass-1* batched solve only;
the neighbor-seeded rescue pass runs ONCE at the end over the failed
lanes of the whole sweep, gathered into a single lane-multiple batch
with globally-nearest (geometry-aware) converged donors.  The r3
per-shard rescue re-ran a ~full-depth batched while_loop for every
shard even when only 1-3 lanes needed it — a fixed ~40% tax per shard
(VERDICT r3 missing #3: 33 steady solves/s vs the 102 headline).
"""

import argparse
import dataclasses
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
    ap.add_argument("--layouts", type=int, default=8,
                    help="obstacle layouts per shard (lanes grouped)")
    ap.add_argument("--family", choices=["reverse", "parallel"],
                    default="reverse",
                    help="scenario family (VERDICT r4 weak #6: the "
                         "sweep must cover >= 2 families)")
    ap.add_argument("--vary-topology", action="store_true",
                    help="randomize obstacle COUNT (2-4) and vertex "
                         "counts (4-5) per layout, padded with masked "
                         "rows")
    ap.add_argument("--pose-only", action="store_true",
                    help="r3 behavior: randomize poses, share one "
                         "obstacle layout + planner field")
    ap.add_argument("--rescue-mu", type=float, default=1e-5)
    ap.add_argument("--passes", type=int, default=1,
                    help="run the whole sweep this many times in one "
                         "process; pass >= 2 re-solves with warm "
                         "executables (the first pass pays ~100 s of "
                         "executable load through the axon remote "
                         "even on persistent-cache hits), which is "
                         "the steady-state a long-running service "
                         "sees.  bench/report.py reports the LAST "
                         "pass.")
    ap.add_argument("--out", default="/tmp/obca_sweep")
    args = ap.parse_args()

    import jax.numpy as jnp

    from obca_tpu.solver import ipm
    from obca_tpu.spec import (parallel_parking_spec,
                               randomized_parallel_parking_specs,
                               randomized_reverse_parking_specs,
                               reverse_parking_spec)
    from obca_tpu.warmstart import geometric, lattice

    os.makedirs(args.out, exist_ok=True)
    log = _common.jsonl_writer(os.path.join(args.out, "metrics.jsonl"))

    cfg = _common.solver_config(args.config, args.max_iter)
    if args.family == "parallel":
        if args.pose_only:
            raise SystemExit("--pose-only is a reverse-family mode")
        # Parallel-family sweep configuration, chosen by a one-shard
        # knob probe (tools/dbg_par_sweep_cfg.py, r5): barrier start
        # pinned at mu_init = 1e-3 (cold pass-1 triples vs 0.1:
        # 37-47 vs 13/128) plus the delta_w = 1e-4 inertia init (the
        # same stabilizer the MPC re-solves use; +10 lanes).  The
        # golden-instance parallel_fastpath statics (SOC on, m=16)
        # measured NO gain on cold randomized draws over the plain
        # f32 statics and run ~40% slower, so the sweep keeps the
        # f32 statics with a 250-iteration budget (the r4-style cap
        # 100 left half the lanes capped out, not failed).
        cfg = dataclasses.replace(
            cfg,
            mu_init=jnp.asarray(1e-3, jnp.float32).astype(
                cfg.mu_init.dtype),
            delta_w=jnp.asarray(1e-4, jnp.float32).astype(
                cfg.delta_w.dtype))
        gen = randomized_parallel_parking_specs
        base = parallel_parking_spec(
            N=args.N, Ts=24.0 / args.N, dtype=cfg.dtype,
            max_obs=4 if args.vary_topology else None,
            max_faces=5 if args.vary_topology else None)
    else:
        gen = randomized_reverse_parking_specs
        base = reverse_parking_spec(
            N=args.N, Ts=24.0 / args.N, dtype=cfg.dtype,
            max_obs=4 if args.vary_topology else None,
            max_faces=5 if args.vary_topology else None)
    lcfg = lattice.LatticeConfig.for_spec(base)
    shard_size = args.shard_size
    n_shards = -(-args.batch // shard_size)

    def shard_specs(i):
        """Deterministic shard generation — shared by the solve loop
        and the rescue gather (resume re-generates identical specs)."""
        if args.pose_only:
            specs = _common.scenario_batch(base, shard_size,
                                           seed=args.seed + i)
            return specs, None
        specs, layouts, _ = gen(
            shard_size, n_layouts=args.layouts, seed=args.seed + i,
            N=args.N, Ts=24.0 / args.N, dtype=cfg.dtype,
            vary_topology=args.vary_topology)
        return specs, layouts

    shared_field = None
    if args.pose_only:
        shared_field = lattice.plan_field(base, lcfg)

    @jax.jit
    def run_shard(specs, layouts):
        if args.pose_only:
            W0 = jax.vmap(
                lambda sp: geometric.lattice_warm_start(
                    sp, dtype=cfg.dtype, field=shared_field)
            )(specs)
        else:
            W0 = geometric.grouped_lattice_warm_start(
                specs, layouts, lcfg, dtype=cfg.dtype)
        return ipm.solve_batch(specs, cfg, W0)

    def save_shard(path, res):
        np.savez(
            path,
            X=np.asarray(res.X), U=np.asarray(res.U),
            W=np.asarray(res.W),
            status=np.asarray(res.status), iters=np.asarray(res.iters),
            err=np.asarray(res.err), obj=np.asarray(res.obj),
            nu=np.asarray(res.duals.nu), s=np.asarray(res.duals.s),
            zL=np.asarray(res.duals.zL), zU=np.asarray(res.duals.zU),
        )

    cfg2 = dataclasses.replace(
        cfg, mu_init=jnp.asarray(args.rescue_mu, cfg.mu_init.dtype))

    @jax.jit
    def rescue(sp, w, d):
        return jax.vmap(
            lambda s_, w_, d_: ipm.solve_single(s_, cfg2, w_,
                                                duals0=d_)
        )(sp, w, d)

    @jax.jit
    def full_resolve(sp, w):
        return jax.vmap(
            lambda s_, w_: ipm.solve_single(s_, cfg, w_)
        )(sp, w)

    for pass_i in range(args.passes):
        if pass_i:
            for i in range(n_shards):
                pth = os.path.join(args.out, f"shard_{i:04d}.npz")
                if os.path.exists(pth):
                    os.remove(pth)
        log(dict(event="pass_start", idx=pass_i))
        one_pass(args, log, shard_specs, run_shard, save_shard,
                 n_shards, shard_size, cfg, rescue, full_resolve)


def one_pass(args, log, shard_specs, run_shard, save_shard, n_shards,
             shard_size, cfg, rescue, full_resolve):
    import jax.numpy as jnp

    from obca_tpu.solver import ipm

    t_start = time.perf_counter()
    for i in range(n_shards):
        path = os.path.join(args.out, f"shard_{i:04d}.npz")
        if os.path.exists(path):
            continue
        specs, layouts = shard_specs(i)
        t0 = time.perf_counter()
        res = run_shard(specs, layouts)
        jax.block_until_ready(res.U)
        dt = time.perf_counter() - t0
        summary = _common.result_summary(res)
        save_shard(path, res)
        log(dict(shard=i, wall_s=round(dt, 3),
                 solves_per_s=round(shard_size / dt, 2), **summary))

    # ------------------------------------------------------------------
    # Global rescue pass: gather every failed lane of the sweep into ONE
    # lane-multiple batch, seed each from its globally-nearest converged
    # donor (geometry-aware feature metric — ipm.donor_features), solve
    # once at the near-final barrier.
    # ------------------------------------------------------------------
    shards = [dict(np.load(os.path.join(args.out,
                                        f"shard_{i:04d}.npz")))
              for i in range(n_shards)]
    all_specs = [shard_specs(i)[0] for i in range(n_shards)]
    specs_flat = jax.tree.map(
        lambda *xs: jnp.concatenate(xs), *all_specs)
    feats = np.asarray(ipm.donor_features(specs_flat))

    # Multi-round: obstacle-randomized failures cluster by layout, and
    # a donor from a DIFFERENT slot geometry cannot seed a mu=1e-5
    # re-solve (r4 measurement: one round recovered 119/222; the rest
    # had no same-layout donor yet).  Each round's recoveries become
    # donors for their layout-mates, so the failure set collapses over
    # 2-3 rounds; stop when everything converged or a round makes no
    # progress.
    for round_i in range(4):
        status = np.concatenate([z["status"] for z in shards])
        failed = np.flatnonzero(status != 0)
        conv = np.flatnonzero(status == 0)
        if not failed.size or not conv.size:
            break
        t0 = time.perf_counter()
        d2 = ((feats[failed][:, None, :]
               - feats[conv][None, :, :]) ** 2).sum(-1)
        donors = conv[np.argmin(d2, axis=1)]          # [F] global ids

        def gather(name):
            return np.concatenate([z[name] for z in shards])

        W_all = gather("W")
        duals_all = {k: gather(k) for k in ("nu", "s", "zL", "zU")}

        # Rescue EVERY failed lane, in shard-size chunks (one compiled
        # shape).  r5 bug: a single np.resize(failed, 128) batch only
        # ever rescued the FIRST 128 failed lanes per round — fine for
        # the reverse family's ~20 failures, but the parallel family's
        # 672 pass-1 failures left 544 lanes untouched every round.
        R = shard_size
        recovered = 0
        seen = set()
        iters_max_r = 0
        for c0 in range(0, failed.size, R):
            chunk = failed[c0:c0 + R]
            idx = np.resize(chunk, R)     # repeats if fewer than R
            didx = np.resize(donors[c0:c0 + R], R)
            specs_r = jax.tree.map(lambda a: a[jnp.asarray(idx)],
                                   specs_flat)
            W_seed = jnp.asarray(W_all[didx], cfg.dtype)
            duals_seed = ipm.DualState(
                nu=jnp.asarray(duals_all["nu"][didx], cfg.dtype),
                s=jnp.asarray(duals_all["s"][didx], cfg.dtype),
                zL=jnp.asarray(duals_all["zL"][didx], cfg.dtype),
                zU=jnp.asarray(duals_all["zU"][didx], cfg.dtype),
            )
            res_r = rescue(specs_r, W_seed, duals_seed)
            jax.block_until_ready(res_r.U)
            st_r = np.asarray(res_r.status)
            iters_max_r = max(iters_max_r,
                              int(np.asarray(res_r.iters).max()))
            # Scatter back into the in-memory shards (first occurrence
            # wins); npz rewritten once after the loop.
            for j, lane in enumerate(idx[: chunk.size]):
                lane = int(lane)
                if st_r[j] != 0 or lane in seen:
                    continue
                seen.add(lane)
                recovered += 1
                si, li = divmod(lane, shard_size)
                z = shards[si]
                take = jax.tree.map(lambda a: a[j], res_r)
                z["X"][li] = np.asarray(take.X)
                z["U"][li] = np.asarray(take.U)
                z["W"][li] = np.asarray(take.W)
                z["status"][li] = int(take.status)
                z["iters"][li] += int(take.iters)
                z["err"][li] = float(take.err)
                z["obj"][li] = float(take.obj)
                z["nu"][li] = np.asarray(take.duals.nu)
                z["s"][li] = np.asarray(take.duals.s)
                z["zL"][li] = np.asarray(take.duals.zL)
                z["zU"][li] = np.asarray(take.duals.zU)
        dt = time.perf_counter() - t0
        log(dict(event="rescue", round=round_i,
                 wall_s=round(dt, 3),
                 n_failed=int(failed.size), n_recovered=recovered,
                 rescue_iters_max=iters_max_r))
        if not recovered:
            break

    # Final fallback: lanes still failing after the warm rounds have
    # no usable same-layout donor — re-solve them with the FULL
    # barrier schedule from the nearest donor's primal trajectory
    # (cold duals).  A full-barrier solve crosses dual basins that a
    # near-floor warm re-solve cannot.
    status = np.concatenate([z["status"] for z in shards])
    failed = np.flatnonzero(status != 0)
    conv = np.flatnonzero(status == 0)
    if failed.size and conv.size:
        t0 = time.perf_counter()
        d2 = ((feats[failed][:, None, :]
               - feats[conv][None, :, :]) ** 2).sum(-1)
        donors = conv[np.argmin(d2, axis=1)]
        W_all = np.concatenate([z["W"] for z in shards])
        recovered = 0
        seen = set()
        iters_max_r = 0
        for c0 in range(0, failed.size, shard_size):
            chunk = failed[c0:c0 + shard_size]
            idx = np.resize(chunk, shard_size)
            didx = np.resize(donors[c0:c0 + shard_size], shard_size)
            specs_r = jax.tree.map(lambda a: a[jnp.asarray(idx)],
                                   specs_flat)
            W_seed = jnp.asarray(W_all[didx], cfg.dtype)
            res_r = full_resolve(specs_r, W_seed)
            jax.block_until_ready(res_r.U)
            st_r = np.asarray(res_r.status)
            iters_max_r = max(iters_max_r,
                              int(np.asarray(res_r.iters).max()))
            for j, lane in enumerate(idx[: chunk.size]):
                lane = int(lane)
                if st_r[j] != 0 or lane in seen:
                    continue
                seen.add(lane)
                recovered += 1
                si, li = divmod(lane, shard_size)
                z = shards[si]
                take = jax.tree.map(lambda a: a[j], res_r)
                z["X"][li] = np.asarray(take.X)
                z["U"][li] = np.asarray(take.U)
                z["W"][li] = np.asarray(take.W)
                z["status"][li] = int(take.status)
                z["iters"][li] += int(take.iters)
                z["err"][li] = float(take.err)
                z["obj"][li] = float(take.obj)
                z["nu"][li] = np.asarray(take.duals.nu)
                z["s"][li] = np.asarray(take.duals.s)
                z["zL"][li] = np.asarray(take.duals.zL)
                z["zU"][li] = np.asarray(take.duals.zU)
        dt = time.perf_counter() - t0
        log(dict(event="rescue", round="full-barrier",
                 wall_s=round(dt, 3), n_failed=int(failed.size),
                 n_recovered=recovered,
                 rescue_iters_max=iters_max_r))

    # Forensics for permanently-failed lanes (VERDICT r4 weak #9): log
    # each one's layout draw (x0/xF/obstacle offsets) + regeneration
    # coordinates (shard seed, lane) so the failure reproduces without
    # re-running the sweep — tools/diagnose_failed_lanes.py re-solves
    # exactly these with the f64 oracle to split solver gaps from
    # infeasible draws.
    status = np.concatenate([z["status"] for z in shards])
    errs = np.concatenate([z["err"] for z in shards])
    for lane in np.flatnonzero(status != 0):
        lane = int(lane)
        si, li = divmod(lane, shard_size)
        sp_l = jax.tree.map(lambda a: np.asarray(a[lane]), specs_flat)
        log(dict(event="failed_lane", shard=si, lane=li,
                 shard_seed=args.seed + si,
                 status=int(status[lane]), err=float(errs[lane]),
                 x0=[round(float(v), 6) for v in sp_l.x0],
                 xF=[round(float(v), 6) for v in sp_l.xF],
                 obs_b=np.round(sp_l.obstacles.b, 6).tolist()))

    for i, z in enumerate(shards):
        np.savez(os.path.join(args.out, f"shard_{i:04d}.npz"), **z)

    wall = time.perf_counter() - t_start
    log(dict(event="sweep_done", shards=n_shards,
             batch=n_shards * shard_size, wall_s=round(wall, 2)))


if __name__ == "__main__":
    main()
