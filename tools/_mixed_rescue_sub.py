"""Subprocess worker: mixed-precision (f64 iterate + f32 Pallas
kernels) rescue of a chunk of failed lanes.

The x64 flag is process-wide and poisons the pure-f32 production path
(weak-f64 literals reach the Mosaic kernels and crash lowering — see
tools/parity_onchip.py), so the mixed last-resort solves run here, in
their own interpreter, exchanging arrays through npz files:

    python tools/_mixed_rescue_sub.py <in.npz> <out.npz>

The parent writes <in.npz> with :func:`save_chunk` (importable without
x64); the worker re-solves every lane with the mixed config and writes
status/W/duals back.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_SPEC_META = ("N", "fix_time", "signed", "max_obs", "max_faces")
_OBS_META = ("num_obs", "num_faces")


def save_chunk(path, specs, W_seed, max_iter=250):
    """Serialize a stacked ProblemSpec batch + warm-start seeds for the
    worker.  Parent-side; no x64 needed."""
    import dataclasses

    out = {"W_seed": np.asarray(W_seed), "max_iter": max_iter}
    for f in dataclasses.fields(specs):
        v = getattr(specs, f.name)
        if f.name == "obstacles":
            for g in dataclasses.fields(v):
                out["obs_" + g.name] = np.asarray(getattr(v, g.name))
        else:
            out["spec_" + f.name] = np.asarray(v)
    np.savez(path, **out)


def main(path_in, path_out):
    import jax

    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from obca_tpu.solver import ipm
    from obca_tpu.spec import (Obstacles, ProblemSpec,
                               mixed_solver_config)

    z = dict(np.load(path_in))
    max_iter = int(z.pop("max_iter"))

    def up(name, a, meta):
        if name in meta:
            v = a.item()
            return bool(v) if isinstance(v, (bool, np.bool_)) else int(v)
        a = jnp.asarray(a)
        return a.astype(jnp.float64) if jnp.issubdtype(
            a.dtype, jnp.floating) else a

    obs = Obstacles(**{k[4:]: up(k[4:], v, _OBS_META)
                       for k, v in z.items() if k.startswith("obs_")})
    spec_kw = {k[5:]: up(k[5:], v, _SPEC_META)
               for k, v in z.items() if k.startswith("spec_")}
    specs = ProblemSpec(obstacles=obs, **spec_kw)
    W_seed = jnp.asarray(z["W_seed"]).astype(jnp.float64)

    cfg = mixed_solver_config(max_iter=max_iter)

    @jax.jit
    def solve(sp, w):
        return jax.vmap(
            lambda s_, w_: ipm.solve_single(s_, cfg, w_))(sp, w)

    res = jax.block_until_ready(solve(specs, W_seed))
    np.savez(path_out,
             status=np.asarray(res.status),
             W=np.asarray(res.W),
             iters=np.asarray(res.iters),
             err=np.asarray(res.err),
             obj=np.asarray(res.obj),
             nu=np.asarray(res.duals.nu), s=np.asarray(res.duals.s),
             zL=np.asarray(res.duals.zL), zU=np.asarray(res.duals.zU))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
