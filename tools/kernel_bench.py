"""Measured Pallas kernel times vs a bytes-based speed-of-light model
(VERDICT r2 weak #7: the roofline needs a defensible measured
denominator; the r2 hand model disagreed with its own measurements).

Times `factor_batched_se` / `solve_batched_se` standalone at the bench
shape and prints measured ms, the HBM-traffic model, and the implied
fraction of speed-of-light.  The model counts actual streams of the
sparse-coupling kernels:

  factor: read K [S,nzp,nzp,B] + write Sinv [S,nzp,nzp,B]
          + write Wc [S,nzp,Cp,B]            (ev/reg/P negligible)
  solve:  fwd read Sinv + r, write y; bwd read Wc + y, write x

Usage: python tools/kernel_bench.py [B] [N]
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/obca_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

HBM_GBPS = 819.0  # v5e spec-sheet HBM bandwidth


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 80

    from obca_tpu import nlp
    from obca_tpu.solver.pallas import blocktri_kernel as bk
    from obca_tpu.spec import reverse_parking_spec

    spec = reverse_parking_spec(N=N, Ts=24.0 / N, dtype=jnp.float32)
    L = nlp.layout_of(spec)
    rows, cols = nlp.coupling_structure(L)
    rows = [int(r) for r in rows]
    cols = [int(c) for c in cols]
    ucols = sorted(set(cols))
    S = N + 1
    nzp = -(-L.nz // 8) * 8
    Cp = -(-len(ucols) // 8) * 8
    Bp = -(-B // bk.LANES) * bk.LANES

    rng = np.random.default_rng(0)
    # Quasidefinite-ish diagonal blocks so the factorization is finite.
    K = np.zeros((S, nzp, nzp, Bp), np.float32)
    R = rng.standard_normal((S, L.nw, L.nw)).astype(np.float32)
    A = (R @ np.swapaxes(R, -1, -2) / L.nw
         + 2.0 * np.eye(L.nw, dtype=np.float32))
    K[:, : L.nw, : L.nw, :] = A[..., None]
    idx = np.arange(L.nw, nzp)
    K[:, idx, idx, :] = -1.0
    ev = 0.3 * rng.standard_normal((S - 1, len(rows), Bp)).astype(
        np.float32)
    reg = np.zeros((nzp, Bp), np.float32)
    r = rng.standard_normal((S, nzp, Bp)).astype(np.float32)

    Kj, evj, regj, rj = map(jnp.asarray, (K, ev, reg, r))

    fac = jax.jit(lambda k_, e_, g_: bk.factor_batched_se(
        k_, e_, g_, rows, cols, L.nw)[:2])
    Sinv, Wc = jax.block_until_ready(fac(Kj, evj, regj))
    sol = jax.jit(lambda s_, w_, e_, r_: bk.solve_batched_se(
        s_, w_, e_, r_, rows, cols, ucols))
    x = jax.block_until_ready(sol(Sinv, Wc, evj, rj))

    def t(f, *a, reps=10):
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(f(*a))
        return (time.perf_counter() - t0) / reps

    t_fac = t(fac, Kj, evj, regj)
    t_sol = t(sol, Sinv, Wc, evj, rj)

    blk = S * nzp * nzp * Bp * 4
    wc = S * nzp * Cp * Bp * 4
    vec = S * nzp * Bp * 4
    fac_bytes = 2 * blk + wc
    sol_bytes = blk + wc + 4 * vec
    out = {
        "B": B, "N": N, "nzp": nzp, "Cp": Cp, "Bp": Bp,
        "factor_ms": round(t_fac * 1e3, 3),
        "factor_model_bytes_MB": round(fac_bytes / 1e6, 1),
        "factor_sol_ms": round(fac_bytes / (HBM_GBPS * 1e6), 3),
        "factor_pct_of_sol": round(
            100 * (fac_bytes / (HBM_GBPS * 1e6)) / (t_fac * 1e3), 1),
        "solve_ms": round(t_sol * 1e3, 3),
        "solve_model_bytes_MB": round(sol_bytes / 1e6, 1),
        "solve_sol_ms": round(sol_bytes / (HBM_GBPS * 1e6), 3),
        "solve_pct_of_sol": round(
            100 * (sol_bytes / (HBM_GBPS * 1e6)) / (t_sol * 1e3), 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
