"""On-chip (Mosaic-compiled Pallas path) control parity for ALL FOUR
canonical families vs the committed f64 oracle goldens (VERDICT r3
next #6b: only the reverse-parking family had hardware parity
evidence; parallel/dist/free-time ran on CPU only).

Each family runs in a subprocess because the x64 flag is process-wide:
the mixed config needs jax_enable_x64 while the pure-f32 families must
run without it (a blanket x64 flag leaks f64 intermediates onto the
chip — VERDICT r2 weak #6).

    python tools/parity_onchip.py            # orchestrate all families
    python tools/parity_onchip.py --family reverse_f32   # one (child)

Writes bench/out/parity_onchip.json when orchestrating.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAMILIES = {
    # name: (golden, x64 needed)
    "reverse_f32": ("reverse_parking_N80", False),
    "parallel_f32": ("parallel_parking_N80", False),
    "dist_mixed": ("reverse_parking_dist_N80", True),
    "freetime_f32": ("reverse_parking_freetime_N80", False),
}


def run_family(name: str):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/obca_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    golden_name, x64 = FAMILIES[name]
    if x64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from obca_tpu.solver import ipm
    from obca_tpu.spec import (f32_solver_config, mixed_solver_config,
                               parallel_fastpath_config,
                               parallel_parking_spec,
                               reverse_parking_spec)

    g = np.load(os.path.join(REPO, "oracle", "goldens",
                             f"{golden_name}.npz"))
    N, Ts = int(g["N"]), float(g["Ts"])
    free = False
    if name == "reverse_f32":
        cfg = f32_solver_config()
        spec = reverse_parking_spec(N=N, Ts=Ts, dtype=cfg.dtype)
    elif name == "parallel_f32":
        cfg = parallel_fastpath_config()
        spec = parallel_parking_spec(N=N, Ts=Ts, dtype=cfg.dtype)
    elif name == "dist_mixed":
        cfg = mixed_solver_config()
        spec = reverse_parking_spec(N=N, Ts=Ts, signed=False,
                                    dtype=cfg.dtype)
    elif name == "freetime_f32":
        cfg = f32_solver_config(max_iter=250)
        spec = reverse_parking_spec(N=N, Ts=Ts, fix_time=False,
                                    dtype=cfg.dtype)
        free = True
    else:
        raise ValueError(name)

    W0 = jnp.asarray(g["W0"]).astype(cfg.dtype)[None]
    specs = jax.tree.map(lambda x: x[None], spec)
    solve = ipm.solve_free_time if free else ipm.solve_single
    # vmap is what dispatches to the Pallas kernels on TPU — a B=1
    # batch runs the real Mosaic-compiled path (padded to 128 lanes).
    res = jax.jit(jax.vmap(
        lambda sp, w: solve(sp, cfg, w)))(specs, W0)
    gap = float(np.abs(
        np.asarray(res.U[0], np.float64) - g["U"]).max())
    print(json.dumps({
        "family": name,
        "golden": golden_name,
        "status": int(np.asarray(res.status)[0]),
        "iters": int(np.asarray(res.iters)[0]),
        "parity_gap_vs_oracle": gap,
        "pass_1e-3": bool(gap < 1e-3),
        "device": str(jax.devices()[0]),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=sorted(FAMILIES))
    ap.add_argument("--out", default=os.path.join(
        REPO, "bench", "out", "parity_onchip.json"))
    args = ap.parse_args()

    if args.family:
        run_family(args.family)
        return

    results = []
    for name in FAMILIES:
        print(f"--- {name}", file=sys.stderr)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--family", name],
            capture_output=True, text=True)
        line = [l for l in p.stdout.splitlines()
                if l.startswith("{")]
        if line:
            results.append(json.loads(line[-1]))
        else:
            results.append({"family": name, "error":
                            p.stderr[-2000:]})
    out = {"families": results,
           "all_pass": all(r.get("pass_1e-3") for r in results)}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
