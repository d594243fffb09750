"""Bisect the r4 Mosaic mixed-precision crash (VERDICT r4 next #3).

Symptom: BENCH_DTYPE=mixed (f64 iterate + f32 factor/kernels) dies at
kernel-compile time with `layout.h:205 Check failed:
has_single_bit(bitwidth_) && bitwidth_ <= 32`.  Every kernel *input*
is cast to f32 at the pallas_call boundary, so the 64-bit leaf must
enter elsewhere (suspects: int64 index constants under x64, weak-type
promotion inside a kernel, the custom_vmap wrapper).

Each step runs in a subprocess (the crash is a signal-6 abort, not an
exception).  Steps build up the mixed call chain one layer at a time:

  kernels_x64_off  all three SE kernels, f32, x64 DISABLED (control)
  factor           factor_batched_se alone, f32 inputs, x64 on
  solve            + solve_batched_se, x64 on
  kkt              make_kkt_solver_se(f32 factor, f64 residual) under
                   vmap on f64 operands (the exact mixed dispatch)
  ipm              full mixed ipm.solve_single at N=8, B=1

    python tools/dbg_mixed_bisect.py             # orchestrate
    python tools/dbg_mixed_bisect.py --step kkt  # one child
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEPS = ["kernels_x64_off", "factor", "solve", "kkt", "ipm"]


def _setup_jax(x64: bool):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/obca_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if x64:
        jax.config.update("jax_enable_x64", True)
    return jax


def _small_system(jnp, np, dtype):
    """A tiny well-conditioned QD block-tridiagonal system with the
    real OBCA coupling sparsity at N=8."""
    sys.path.insert(0, REPO)
    from obca_tpu import nlp
    from obca_tpu.spec import reverse_parking_spec

    spec = reverse_parking_spec(N=8, dtype=jnp.float64)
    L = nlp.layout_of(spec)
    rows, cols = nlp.coupling_structure(L)
    S, nz, nw = L.N + 1, L.nz, L.nw
    rng = np.random.default_rng(0)
    K = np.zeros((S, nz, nz))
    d = np.concatenate([np.full(nw, 2.0), np.full(nz - nw, -2.0)])
    K[:, np.arange(nz), np.arange(nz)] = d
    K += 0.01 * rng.standard_normal(K.shape)
    K = 0.5 * (K + np.swapaxes(K, 1, 2))
    ev = 0.1 * rng.standard_normal((S - 1, len(rows)))
    rhs = rng.standard_normal((S, nz))
    return (jnp.asarray(K, dtype), jnp.asarray(ev, dtype),
            jnp.asarray(rhs, dtype), rows, cols, nw, L)


def run_step(name: str):
    x64 = name != "kernels_x64_off"
    jax = _setup_jax(x64)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)

    if name in ("kernels_x64_off", "factor", "solve"):
        from obca_tpu.solver.pallas import blocktri_kernel as bk

        K, ev, rhs, rows, cols, nw, L = _small_system(jnp, np,
                                                      jnp.float64)
        B = 1
        nz = K.shape[1]
        nzp = -(-nz // 8) * 8
        Bp = bk.LANES
        Kt = jnp.broadcast_to(K[..., None], K.shape + (B,))
        evt = jnp.broadcast_to(ev[..., None], ev.shape + (B,))
        rt = jnp.broadcast_to(rhs[..., None], rhs.shape + (B,))
        Kt_p = bk.pad_k(Kt.astype(jnp.float32), nzp, Bp, nw=nw)
        evt_p = jnp.pad(evt.astype(jnp.float32),
                        ((0, 0), (0, 0), (0, Bp - B)))
        reg_p = jnp.zeros((nzp, Bp), jnp.float32)
        rt_p = jnp.pad(rt.astype(jnp.float32),
                       ((0, 0), (0, nzp - nz), (0, Bp - B)))

        ucols = sorted({int(c) for c in cols})

        @jax.jit
        def run_factor(Kp, evp, regp):
            # ucols is static — returning it through jit would turn
            # the ints into traced arrays.
            return bk.factor_batched_se(Kp, evp, regp, rows, cols,
                                        nw)[:2]

        Sinv, Wc = jax.block_until_ready(
            run_factor(Kt_p, evt_p, reg_p))
        print("factor ok", Sinv.shape, Sinv.dtype)
        if name == "factor":
            return

        @jax.jit
        def run_solve(Sv, Wv, evp, rp):
            return bk.solve_batched_se(Sv, Wv, evp, rp, rows, cols,
                                       ucols)

        x = jax.block_until_ready(run_solve(Sinv, Wc, evt_p, rt_p))
        print("solve ok", x.shape, x.dtype)
        return

    if name == "kkt":
        from obca_tpu.solver import kkt

        K, ev, rhs, rows, cols, nw, L = _small_system(jnp, np,
                                                      jnp.float64)
        solver = kkt.make_kkt_solver_se(nw, 4, jnp.float32,
                                        jnp.float64, rows, cols)
        reg = jnp.concatenate(
            [jnp.full((nw,), 1e-4), jnp.full((K.shape[1] - nw,), -1e-4)]
        ).astype(jnp.float64)
        Kb = K[None]
        evb = ev[None]
        regb = reg[None]
        rhsb = rhs[None]
        d, lin = jax.block_until_ready(
            jax.jit(jax.vmap(solver))(Kb, evb, regb, rhsb))
        print("kkt ok", d.shape, d.dtype, "lin", np.asarray(lin))
        return

    if name == "ipm":
        from obca_tpu.solver import ipm
        from obca_tpu.spec import mixed_solver_config, \
            reverse_parking_spec

        cfg = mixed_solver_config(max_iter=30)
        spec = reverse_parking_spec(N=8, dtype=cfg.dtype)
        specs = jax.tree.map(lambda x: x[None], spec)
        res = jax.block_until_ready(
            jax.jit(jax.vmap(lambda sp: ipm.solve_single(sp, cfg)))(
                specs))
        print("ipm ok status", np.asarray(res.status),
              "iters", np.asarray(res.iters))
        return

    raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", default=None)
    args = ap.parse_args()
    if args.step:
        run_step(args.step)
        return

    results = {}
    for s in STEPS:
        print(f"=== step {s} ===", flush=True)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--step", s],
            capture_output=True, text=True, timeout=1800,
        )
        ok = p.returncode == 0
        tail = (p.stdout + p.stderr)[-2000:]
        results[s] = {"ok": ok, "rc": p.returncode,
                      "tail": tail if not ok else p.stdout[-300:]}
        print(("OK  " if ok else "FAIL") + f" rc={p.returncode}")
        if not ok:
            print(tail)
    print(json.dumps({k: {"ok": v["ok"]} for k, v in results.items()}))
    out = os.path.join(REPO, "bench", "out", "mixed_bisect.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
