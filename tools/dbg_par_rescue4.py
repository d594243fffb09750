"""Experiment 3: maneuver-class diversity for the terminally stuck
parallel lanes (donor transfer, donor diversity, and oracle-grade
mixed solves all fail — dbg_par_rescue2/3).

Hypothesis: those start poses need a DIFFERENT maneuver class than the
one the production lattice config found (e.g. a pull-forward before
the reverse swing); every donor seed and every re-solve inherits the
same homotopy class, so nothing in the ladder can cross over.  The
lattice planner itself is the class selector: re-plan the failed
lane's warm start under alternative LatticeConfigs and solve cold.

  H1  reverse_penalty = 1.0   (no reverse bias — frees backing-first)
  H2  delta_frac = 0.7        (wider arcs — different swing geometry)
  H3  turn_penalty = 1.4      (straighter approach)
  H4  reverse_penalty = 2.0, delta_frac = 0.85

Caches the post-ladder state per seed in /tmp so reruns skip the
pass-1 + warm-round prefix.

Run:  python tools/dbg_par_rescue4.py [shard_seed...]
"""

import dataclasses
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from obca_tpu import nlp
from obca_tpu.solver import ipm
from obca_tpu.spec import (f32_solver_config, parallel_parking_spec,
                           randomized_parallel_parking_specs)
from obca_tpu.warmstart import geometric, lattice

SHARD = 128
LAYOUTS = 8
N = 80


def x0_blend(W, x0_new, L, K=24):
    x = W[:, L.sl_x]
    off = x0_new - x[0]
    k = jnp.arange(x.shape[0], dtype=W.dtype)
    a = jnp.maximum(0.0, 1.0 - k / K)[:, None]
    return W.at[:, L.sl_x].set(x + a * off)


def main():
    seeds = [int(a) for a in sys.argv[1:]] or [3, 7]
    cfg = f32_solver_config(max_iter=250)
    cfg = dataclasses.replace(
        cfg,
        mu_init=jnp.asarray(1e-3, cfg.mu_init.dtype),
        delta_w=jnp.asarray(1e-4, cfg.delta_w.dtype))
    base = parallel_parking_spec(N=N, Ts=24.0 / N, dtype=cfg.dtype)
    lcfg = lattice.LatticeConfig.for_spec(base)
    L = nlp.layout_of(base)

    @jax.jit
    def run_shard(specs, layouts):
        W0 = geometric.grouped_lattice_warm_start(
            specs, layouts, lcfg, dtype=cfg.dtype)
        return ipm.solve_batch(specs, cfg, W0)

    cfg_warm = dataclasses.replace(
        cfg, mu_init=jnp.asarray(1e-5, cfg.mu_init.dtype))

    @jax.jit
    def rescue_warm(sp, w, d):
        return jax.vmap(lambda s_, w_, d_: ipm.solve_single(
            s_, cfg_warm, w_, duals0=d_))(sp, w, d)

    @jax.jit
    def resolve_full(sp, w):
        return jax.vmap(lambda s_, w_: ipm.solve_single(
            s_, cfg, w_))(sp, w)

    @jax.jit
    def resolve_group(sp, w):
        return jax.vmap(lambda s_, w_: ipm.solve_single(
            s_, cfg, w_))(sp, w)

    for seed in seeds:
        specs, layouts, group = randomized_parallel_parking_specs(
            SHARD, n_layouts=LAYOUTS, seed=seed, N=N, Ts=24.0 / N,
            dtype=cfg.dtype)
        cache = f"/tmp/par_rescue4_seed{seed}.npz"
        feats = np.asarray(ipm.donor_features(specs))

        if os.path.exists(cache):
            z = np.load(cache)
            st = z["st"].copy()
            W_all = z["W_all"].copy()
            print(f"seed {seed}: cached post-ladder "
                  f"{int((st == 0).sum())}/{SHARD}", flush=True)
        else:
            t0 = time.perf_counter()
            res = jax.block_until_ready(run_shard(specs, layouts))
            st = np.asarray(res.status).copy()
            W_all = np.asarray(res.W).copy()
            duals_all = jax.tree.map(
                lambda a: np.asarray(a).copy(), res.duals)
            print(f"seed {seed}: pass-1 {int((st == 0).sum())}"
                  f"/{SHARD} ({time.perf_counter() - t0:.1f}s)",
                  flush=True)

            def donor_ids(failed, k=0):
                conv = np.flatnonzero(st == 0)
                d2 = ((feats[failed][:, None] - feats[conv][None])
                      ** 2).sum(-1)
                order = np.argsort(d2, axis=1)
                kk = np.minimum(k, order.shape[1] - 1)
                return conv[order[np.arange(failed.size), kk]]

            for rnd in range(3):
                failed = np.flatnonzero(st != 0)
                if not failed.size:
                    break
                didx = np.resize(donor_ids(failed), SHARD)
                idx = np.resize(failed, SHARD)
                sp_r = jax.tree.map(
                    lambda a: a[jnp.asarray(idx)], specs)
                rr = jax.block_until_ready(rescue_warm(
                    sp_r, jnp.asarray(W_all[didx]),
                    jax.tree.map(lambda a: jnp.asarray(a[didx]),
                                 duals_all)))
                sr = np.asarray(rr.status)
                rrW = np.asarray(rr.W)
                rrd = jax.tree.map(np.asarray, rr.duals)
                rec = 0
                for j, lane in enumerate(failed):
                    if sr[j] == 0 and st[lane] != 0:
                        st[lane] = 0
                        rec += 1
                        W_all[lane] = rrW[j]
                        for f in duals_all._fields:
                            getattr(duals_all, f)[lane] = getattr(
                                rrd, f)[j]
                print(f"  warm round {rnd}: {rec}/{failed.size}",
                      flush=True)
                if not rec:
                    break

            # blend + full barrier (the measured F step)
            failed = np.flatnonzero(st != 0)
            if failed.size:
                didx = np.resize(donor_ids(failed), SHARD)
                idx = np.resize(failed, SHARD)
                sp_r = jax.tree.map(
                    lambda a: a[jnp.asarray(idx)], specs)
                W_seed = jax.vmap(
                    lambda w, x0: x0_blend(w, x0, L)
                )(jnp.asarray(W_all[didx]), sp_r.x0)
                rr = jax.block_until_ready(resolve_full(sp_r, W_seed))
                sr = np.asarray(rr.status)
                rrW = np.asarray(rr.W)
                rec = 0
                for j, lane in enumerate(failed):
                    if sr[j] == 0 and st[lane] != 0:
                        st[lane] = 0
                        W_all[lane] = rrW[j]
                        rec += 1
                print(f"  F blend+full: {rec}/{failed.size}",
                      flush=True)
            np.savez(cache, st=st, W_all=W_all)

        # ---- maneuver-class diversity on the stuck set ----
        stuck = np.flatnonzero(st != 0)
        print(f"  stuck: {stuck.tolist()}", flush=True)
        if not stuck.size:
            continue
        variants = dict(
            H1=dict(reverse_penalty=1.0),
            H2=dict(delta_frac=0.7),
            H3=dict(turn_penalty=1.4),
            H4=dict(reverse_penalty=2.0, delta_frac=0.85),
        )
        ws_jit = {}

        def variant_ws(lcfg_v, sp_r, lay_r, key):
            # one field per call (G=1): a 128-layout vmapped field
            # stack is an 18 GB HBM allocation (measured OOM)
            if key not in ws_jit:
                ws_jit[key] = jax.jit(
                    lambda s_, l_:
                    geometric.grouped_lattice_warm_start(
                        s_, l_, lcfg_v, dtype=cfg.dtype))
            return ws_jit[key](sp_r, lay_r)

        for tag, kw in variants.items():
            failed = np.flatnonzero(st != 0)
            if not failed.size:
                break
            lcfg_v = lattice.LatticeConfig.for_spec(base, **kw)
            t0 = time.perf_counter()
            rec = 0
            for li in np.unique(failed // group):
                lanes = failed[failed // group == li]
                idx = np.resize(lanes, group)
                sp_r = jax.tree.map(
                    lambda a: a[jnp.asarray(idx)], specs)
                lay_r = jax.tree.map(
                    lambda a: a[jnp.asarray([li])], layouts)
                W0 = variant_ws(lcfg_v, sp_r, lay_r, tag)
                rr = jax.block_until_ready(
                    resolve_group(sp_r, W0))
                sr = np.asarray(rr.status)
                for j, lane in enumerate(idx[: lanes.size]):
                    if sr[j] == 0 and st[lane] != 0:
                        st[lane] = 0
                        rec += 1
            print(f"  {tag} {kw}: {rec}/{failed.size} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        final = np.flatnonzero(st != 0)
        print(f"  FINAL: {SHARD - final.size}/{SHARD} "
              f"(stuck {final.tolist()})", flush=True)


if __name__ == "__main__":
    main()
