"""Long-horizon crossover: cyclic reduction vs sequential block-Thomas
(SURVEY.md §5 long-context; the measured descope note VERDICT r2 #8
asked for).

Times `blocktri.factor+solve` (O(S) sequential depth) against
`cyclic.factor+solve` (O(log S) depth, ~2x FLOPs) on random
quasidefinite block-tridiagonal systems of growing stage count, on the
current default device.  Prints one JSON line per S with the measured
crossover verdict.

Usage: python tools/bench_cyclic.py [--nw 7] [--nc 6] [--batch 8]
"""

import argparse
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


def _random_qd(rng, S, nw, nc, B):
    nz = nw + nc
    R = rng.standard_normal((B, S, nw, nw))
    A = R @ np.swapaxes(R, -1, -2) / nw + np.eye(nw)
    Q = rng.standard_normal((B, S, nc, nc))
    D = -(Q @ np.swapaxes(Q, -1, -2) / nc + np.eye(nc))
    Bm = rng.standard_normal((B, S, nw, nc))
    K = np.zeros((B, S, nz, nz))
    K[:, :, :nw, :nw] = A
    K[:, :, :nw, nw:] = Bm
    K[:, :, nw:, :nw] = np.swapaxes(Bm, -1, -2)
    K[:, :, nw:, nw:] = D
    E = 0.2 * rng.standard_normal((B, S - 1, nz, nz))
    r = rng.standard_normal((B, S, nz))
    return jnp.asarray(K), jnp.asarray(E), jnp.asarray(r)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nw", type=int, default=7)
    ap.add_argument("--nc", type=int, default=6)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[81, 161, 321, 641, 1281])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the env pins "
                         "JAX_PLATFORMS=axon; the config knob wins)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from obca_tpu.solver import blocktri, cyclic

    rng = np.random.default_rng(0)
    nw = args.nw
    rows = []
    for S in args.sizes:
        K, E, r = _random_qd(rng, S, nw, args.nc, args.batch)

        seq = jax.jit(jax.vmap(
            lambda Kb, Eb, rb: blocktri.solve(
                blocktri.factor(Kb, Eb, nw=nw), rb)
        ))
        par = jax.jit(jax.vmap(
            lambda Kb, Eb, rb: cyclic.solve(
                cyclic.factor(Kb, Eb, nw=nw), rb)
        ))

        x_s = jax.block_until_ready(seq(K, E, r))
        x_p = jax.block_until_ready(par(K, E, r))
        gap = float(jnp.max(jnp.abs(x_s - x_p)))

        def t(f):
            t0 = time.perf_counter()
            for _ in range(3):
                jax.block_until_ready(f(K, E, r))
            return (time.perf_counter() - t0) / 3

        ts, tp = t(seq), t(par)
        row = {
            "S": S, "batch": args.batch,
            "nz": nw + args.nc,
            "sequential_ms": round(ts * 1e3, 2),
            "cyclic_ms": round(tp * 1e3, 2),
            "speedup": round(ts / tp, 2),
            "max_diff": gap,
            "device": str(jax.devices()[0]),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # The honest crossover statement must account for non-monotone
    # data (the r4 artifact's one-liner said "wins from S >= 161"
    # while its own rows showed 0.44x/0.15x at S=641/1281 — VERDICT
    # r4 weak #2).  Report the winning band AND whether the largest
    # tested S wins; only an unbroken winning tail supports a
    # long-horizon claim.
    wins = [r["S"] for r in rows if r["speedup"] > 1.0]
    tail_wins = bool(rows) and rows[-1]["speedup"] > 1.0
    if not wins:
        verdict = ("sequential scan faster at every tested S — "
                   "N=80 stays on the sequential path")
    elif tail_wins and all(r["speedup"] > 1.0 for r in rows
                           if r["S"] >= wins[0]):
        verdict = f"cyclic reduction wins from S >= {wins[0]}"
    else:
        best = max(rows, key=lambda r: r["speedup"])
        verdict = (
            f"cyclic wins only in a narrow band (S in {wins}, best "
            f"{best['speedup']}x at S={best['S']}) and LOSES in the "
            f"long-horizon regime it exists for "
            f"({rows[-1]['speedup']}x at S={rows[-1]['S']}) — "
            "sequential block-Thomas is the production path at every "
            "practical S on this part")
    print(json.dumps({"verdict": verdict}))


if __name__ == "__main__":
    main()
