"""Solve the canonical parking scenarios end-to-end (the reference's
`main.jl` driver role — SURVEY.md §2.2 C1, §3.1).

    python bench/run_parking.py --scenario reverse --variant signed
    python bench/run_parking.py --scenario parallel --N 80 --plot out.png

Prints a JSON summary per solve; optionally writes a trajectory plot
and checks parity against the committed float64 oracle goldens.
"""

import argparse
import json
import os

import _common  # noqa: F401  (jax config + sys.path)
import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", choices=["reverse", "parallel"],
                    default="reverse")
    ap.add_argument("--variant", choices=["signed", "dist"],
                    default="signed")
    ap.add_argument("--N", type=int, default=40)
    ap.add_argument("--Ts", type=float, default=None)
    ap.add_argument("--free-time", action="store_true")
    ap.add_argument("--config", choices=["f64", "mixed", "f32"],
                    default="f64")
    ap.add_argument("--max-iter", type=int, default=150)
    ap.add_argument("--plot", default=None, help="write scene PNG here")
    ap.add_argument("--golden", default=None,
                    help="oracle golden .npz for control parity check")
    args = ap.parse_args()

    from obca_tpu.solver import ipm
    from obca_tpu.spec import parallel_parking_spec, reverse_parking_spec
    from obca_tpu.warmstart import geometric

    make = (reverse_parking_spec if args.scenario == "reverse"
            else parallel_parking_spec)
    Ts = args.Ts if args.Ts is not None else 24.0 / args.N
    spec = make(N=args.N, Ts=Ts, signed=(args.variant == "signed"),
                fix_time=not args.free_time)
    cfg = _common.solver_config(args.config, args.max_iter)

    @jax.jit
    def solve(sp):
        W0 = geometric.lattice_warm_start(sp, dtype=cfg.dtype)
        return ipm.solve_single(sp, cfg, W0)

    res = jax.block_until_ready(solve(spec))
    out = {
        "scenario": args.scenario,
        "variant": args.variant,
        "N": args.N,
        "config": args.config,
        "status": int(res.status),
        "iters": int(res.iters),
        "kkt_err": float(res.err),
        "objective": float(res.obj),
    }
    if args.golden and os.path.exists(args.golden):
        g = np.load(args.golden)
        out["u_parity_max_abs"] = float(
            np.max(np.abs(np.asarray(res.U) - g["U"]))
        )
    if args.plot:
        from obca_tpu import viz

        viz.plot_trajectory(spec, np.asarray(res.X), np.asarray(res.U),
                            path=args.plot)
        out["plot"] = args.plot
    print(json.dumps(out))


if __name__ == "__main__":
    main()
