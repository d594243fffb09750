"""Experiment 2: fallback ladder for the lanes that survive the warm
donor rounds AND the full-barrier fallback (dbg_par_rescue2 measured
~6-11 per bad shard).  Candidates:

  F  x0-blend donor, full barrier (rescue2's B/C move: morph the
     seeded X so stage 0 sits at the failed lane's own x0)
  A  plain donor, full barrier (production fallback)
  E  k-th nearest donor (k = 2, 3) full-barrier — donor DIVERSITY
     (basin selection is the failure mode; one donor = one basin)
  G  mixed-precision (f64 iterate + f32 kernels) from the donor —
     the oracle-grade path as a last resort; runs in a SUBPROCESS
     because x64 is process-wide (tools/_mixed_rescue_sub.py)

Run:  python tools/dbg_par_rescue3.py [shard_seed...]
"""

import dataclasses
import os
import subprocess
import sys
import tempfile
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
from tools._mixed_rescue_sub import save_chunk

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

    for seed in seeds:
        specs, layouts, group = randomized_parallel_parking_specs(
            SHARD, n_layouts=LAYOUTS, seed=seed, N=N, Ts=24.0 / N,
            dtype=cfg.dtype)
        t0 = time.perf_counter()
        res = jax.block_until_ready(run_shard(specs, layouts))
        st = np.asarray(res.status).copy()
        W_all = np.asarray(res.W).copy()
        duals_all = jax.tree.map(lambda a: np.asarray(a).copy(),
                                 res.duals)
        print(f"seed {seed}: pass-1 {int((st == 0).sum())}/{SHARD} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

        feats = np.asarray(ipm.donor_features(specs))

        def donor_ids(failed, k=0):
            conv = np.flatnonzero(st == 0)
            d2 = ((feats[failed][:, None] - feats[conv][None]) ** 2
                  ).sum(-1)
            order = np.argsort(d2, axis=1)
            kk = np.minimum(k, order.shape[1] - 1)
            return conv[order[np.arange(failed.size), kk]]

        def absorb(failed, status_r, W_r, tag):
            rec = 0
            for j, lane in enumerate(failed):
                if status_r[j] == 0 and st[lane] != 0:
                    st[lane] = 0
                    rec += 1
                    W_all[lane] = W_r[j]
            print(f"  {tag}: {rec}/{failed.size}", flush=True)
            return rec

        # Warm donor rounds (production).
        for rnd in range(3):
            failed = np.flatnonzero(st != 0)
            if not failed.size:
                break
            didx = np.resize(donor_ids(failed), SHARD)
            idx = np.resize(failed, SHARD)
            sp_r = jax.tree.map(lambda a: a[jnp.asarray(idx)], specs)
            rr = jax.block_until_ready(rescue_warm(
                sp_r, jnp.asarray(W_all[didx]),
                jax.tree.map(lambda a: jnp.asarray(a[didx]),
                             duals_all)))
            rec = absorb(failed, np.asarray(rr.status),
                         np.asarray(rr.W), f"warm round {rnd}")
            # keep recovered duals as future donor material
            rrd = jax.tree.map(np.asarray, rr.duals)
            for j, lane in enumerate(failed):
                if st[lane] == 0:
                    for f in duals_all._fields:
                        getattr(duals_all, f)[lane] = getattr(
                            rrd, f)[j]
            if not rec:
                break

        def ladder_step(tag, k=0, blend=False, mixed=False):
            failed = np.flatnonzero(st != 0)
            if not failed.size:
                return
            didx = np.resize(donor_ids(failed, k), SHARD)
            idx = np.resize(failed, SHARD)
            sp_r = jax.tree.map(lambda a: a[jnp.asarray(idx)], specs)
            W_seed = jnp.asarray(W_all[didx])
            if blend:
                W_seed = jax.vmap(
                    lambda w, x0: x0_blend(w, x0, L))(W_seed, sp_r.x0)
            if mixed:
                with tempfile.TemporaryDirectory() as td:
                    pin = os.path.join(td, "in.npz")
                    pout = os.path.join(td, "out.npz")
                    save_chunk(pin, sp_r, np.asarray(W_seed))
                    t0 = time.perf_counter()
                    subprocess.run(
                        [sys.executable,
                         os.path.join(REPO, "tools",
                                      "_mixed_rescue_sub.py"),
                         pin, pout],
                        check=True, cwd=REPO,
                        stdout=subprocess.DEVNULL,
                        stderr=subprocess.DEVNULL)
                    z = np.load(pout)
                    absorb(failed, z["status"],
                           z["W"].astype(W_all.dtype),
                           f"{tag} ({time.perf_counter()-t0:.0f}s)")
                return
            rr = jax.block_until_ready(resolve_full(sp_r, W_seed))
            absorb(failed, np.asarray(rr.status), np.asarray(rr.W),
                   tag)

        ladder_step("F  blend+full", blend=True)
        ladder_step("A  donor+full")
        ladder_step("E2 2nd-donor+full", k=1)
        ladder_step("E3 3rd-donor+full", k=2)
        ladder_step("G  mixed donor", mixed=True)
        ladder_step("G2 mixed 2nd-donor", k=1, mixed=True)
        failed = np.flatnonzero(st != 0)
        print(f"  FINAL: {SHARD - failed.size}/{SHARD} "
              f"(failed {failed.tolist()})", flush=True)


if __name__ == "__main__":
    main()
