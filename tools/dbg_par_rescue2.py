"""Experiment: why do ~98 parallel-family lanes survive every rescue
round (sweep_report_par.json: 926/1024) when every layout has >= 112
converged same-layout donors?

Hypothesis under test: the donor's primal trajectory starts at the
DONOR's start pose; stage 0 of the failed lane is pinned to ITS OWN
x0, so the seeded iterate opens with a large bc-row violation that a
near-floor (mu=1e-5) re-solve cannot repair without leaving the
donor's basin — and the full-barrier fallback from the same seed
re-runs the same cold basin selection that failed pass 1.

Variant grid on one bad shard (shard 3 of the recorded sweep: 16
failures in one layout, 11 in another):

  A  donor primal + donor duals, mu=1e-5            (production round)
  B  A + x0-BLEND: morph stages 0..K of the seeded X so stage 0 sits
     exactly at the failed lane's x0 (offset decays linearly to 0)
  C  x0-blend donor primal, cold duals, full mu=1e-3 barrier
  D  x0-blend donor primal, cold duals, mu=1e-2 (stronger escape)

Run:  python tools/dbg_par_rescue2.py [shard_seed...]
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
    """Shift the seeded state trajectory so stage 0 sits at x0_new,
    decaying the shift to zero over K stages (keeps the tail — and
    the in-slot maneuver — in the donor's basin)."""
    x = W[:, L.sl_x]
    off = x0_new - x[0]
    k = jnp.arange(x.shape[0], dtype=W.dtype)
    a = jnp.maximum(0.0, 1.0 - k / K)[:, None]
    return W.at[:, L.sl_x].set(x + a * off)


def main():
    seeds = [int(a) for a in sys.argv[1:]] or [3]
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
    cfg_mid = dataclasses.replace(
        cfg, mu_init=jnp.asarray(1e-2, cfg.mu_init.dtype))

    @jax.jit
    def rescue_warm(sp, w, d):
        return jax.vmap(lambda s_, w_, d_: ipm.solve_single(
            s_, cfg_warm, w_, duals0=d_))(sp, w, d)

    @jax.jit
    def resolve_cfg3(sp, w):
        return jax.vmap(lambda s_, w_: ipm.solve_single(
            s_, cfg, w_))(sp, w)

    @jax.jit
    def resolve_cfg2(sp, w):
        return jax.vmap(lambda s_, w_: ipm.solve_single(
            s_, cfg_mid, w_))(sp, w)

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
        for rnd in range(3):
            failed = np.flatnonzero(st != 0)
            conv = np.flatnonzero(st == 0)
            if not failed.size:
                break
            d2 = ((feats[failed][:, None] - feats[conv][None]) ** 2
                  ).sum(-1)
            donors = conv[np.argmin(d2, axis=1)]
            idx = np.resize(failed, SHARD)
            didx = np.resize(donors, SHARD)
            sp_r = jax.tree.map(lambda a: a[jnp.asarray(idx)], specs)
            W_seed = jnp.asarray(W_all[didx])
            duals = jax.tree.map(
                lambda a: jnp.asarray(a[didx]), duals_all)
            rr = jax.block_until_ready(
                rescue_warm(sp_r, W_seed, duals))
            str_ = np.asarray(rr.status)[: failed.size]
            rec = failed[str_ == 0]
            print(f"  round {rnd} A(warm): {rec.size}/{failed.size}",
                  flush=True)
            rrW = np.asarray(rr.W)
            rrd = jax.tree.map(np.asarray, rr.duals)
            for j, lane in enumerate(failed):
                if str_[j] == 0:
                    st[lane] = 0
                    W_all[lane] = rrW[j]
                    for f in duals_all._fields:
                        getattr(duals_all, f)[lane] = getattr(rrd, f)[j]
            if not rec.size:
                break

        failed = np.flatnonzero(st != 0)
        print(f"  after warm rounds: {failed.size} failed "
              f"(lanes {failed.tolist()})", flush=True)
        if not failed.size:
            continue
        conv = np.flatnonzero(st == 0)
        d2 = ((feats[failed][:, None] - feats[conv][None]) ** 2).sum(-1)
        donors = conv[np.argmin(d2, axis=1)]
        idx = np.resize(failed, SHARD)
        didx = np.resize(donors, SHARD)
        sp_r = jax.tree.map(lambda a: a[jnp.asarray(idx)], specs)
        W_seed = jnp.asarray(W_all[didx])
        duals = jax.tree.map(lambda a: jnp.asarray(a[didx]), duals_all)

        # Variant A-full: plain donor primal, full barrier (current
        # production fallback).
        ra = jax.block_until_ready(resolve_cfg3(sp_r, W_seed))
        sa = np.asarray(ra.status)[: failed.size]
        print(f"  A-full (donor, mu=1e-3): {(sa == 0).sum()}"
              f"/{failed.size}", flush=True)

        # Variant B: x0-blend + warm duals at mu=1e-5.
        W_blend = jax.vmap(
            lambda w, x0: x0_blend(w, x0, L))(W_seed, sp_r.x0)
        rb = jax.block_until_ready(rescue_warm(sp_r, W_blend, duals))
        sb = np.asarray(rb.status)[: failed.size]
        print(f"  B (blend, warm duals, mu=1e-5): {(sb == 0).sum()}"
              f"/{failed.size}", flush=True)

        # Variant C: x0-blend, cold duals, mu=1e-3.
        rc = jax.block_until_ready(resolve_cfg3(sp_r, W_blend))
        sc = np.asarray(rc.status)[: failed.size]
        print(f"  C (blend, cold, mu=1e-3): {(sc == 0).sum()}"
              f"/{failed.size}", flush=True)

        # Variant D: x0-blend, cold duals, mu=1e-2.
        rd = jax.block_until_ready(resolve_cfg2(sp_r, W_blend))
        sd = np.asarray(rd.status)[: failed.size]
        print(f"  D (blend, cold, mu=1e-2): {(sd == 0).sum()}"
              f"/{failed.size}", flush=True)

        union = ((sa == 0) | (sb == 0) | (sc == 0) | (sd == 0)).sum()
        print(f"  union: {union}/{failed.size}", flush=True)


if __name__ == "__main__":
    main()
