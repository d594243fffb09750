"""KKT linear-system solver dispatch: XLA per-scenario vs Pallas batch.

The IPM calls `solve` on one (Ruiz-scaled) block-tridiagonal system per
scenario, under `jax.vmap`.  This module makes that call *batch-aware*
via `jax.custom_batching.custom_vmap`:

  * unbatched (oracle solves, tests, CPU): the XLA reference path —
    `blocktri.factor` + `blocktri.solve_gcr`;
  * batched on TPU: one transpose to the batch-in-lanes layout
    [S, nz, nz, B] and the Pallas kernels (`solver.pallas`), with the
    GCR orthogonalization running as fused XLA elementwise ops in the
    kernel layout.  This replaces thousands of tiny sequential scan
    steps per IPM iteration (the round-1 0.5 solves/s failure) with
    two pipelined kernels.

Both paths implement the same math; `tests/test_pallas_blocktri.py`
asserts they agree.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from obca_tpu.solver import blocktri


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _gcr_batched(step_fn, rhs, m: int, rd):
    """GCR(m) over a batch: vectors [S, nz, B], scalars [B] (lane-wise
    scalar arithmetic — every scenario runs its own GCR in lockstep).
    Mirrors blocktri.solve_gcr.  ``step_fn(res) -> (p, Ap)`` supplies
    the preconditioned direction and its matvec — fused into one
    Pallas call on the f32 fast path (bwd_matvec_se), two calls + an
    XLA matvec otherwise."""
    tiny = jnp.asarray(np.finfo(np.dtype(rd)).tiny, rd)
    rrd = rhs.astype(rd)
    x = jnp.zeros_like(rrd)
    res = rrd
    ps, aps = [], []
    for _ in range(m):
        p, ap = step_fn(res)
        p = p.astype(rd)
        ap = ap.astype(rd)
        for pj, apj in zip(ps, aps):
            beta = jnp.sum(ap * apj, axis=(0, 1), keepdims=True)
            p = p - beta * pj
            ap = ap - beta * apj
        nrm = jnp.sqrt(jnp.sum(ap * ap, axis=(0, 1), keepdims=True))
        inv = jnp.where(nrm > tiny, 1.0 / jnp.maximum(nrm, tiny), 0.0)
        p = p * inv
        ap = ap * inv
        alpha = jnp.sum(res * ap, axis=(0, 1), keepdims=True)
        x = x + alpha * p
        res = res - alpha * ap
        ps.append(p)
        aps.append(ap)
    return x, jnp.max(jnp.abs(res), axis=(0, 1))


def _matvec_lanes(K, E, x):
    """Block-tridiagonal matvec in kernel layout: K [S, nz, nz, B],
    E [S-1, nz, nz, B], x [S, nz, B]."""
    out = jnp.sum(K * x[:, None, :, :], axis=2)
    out = out.at[:-1].add(jnp.sum(E * x[1:, None, :, :], axis=2))
    out = out.at[1:].add(jnp.sum(E * x[:-1, :, None, :], axis=1))
    return out


def _matvec_lanes_se(K, ev, rows, cols, x):
    """Block-tridiagonal matvec with the coupling as sparse values:
    K [S, nz, nz, B], ev [S-1, nnz, B], x [S, nz, B].  The E terms are
    placed with one-hot selection matmuls instead of scatters (TPU
    executes scatters element at a time; a [nnz, nz] one-hot
    contraction is a tiny matmul)."""
    nz = K.shape[1]
    nnz = len(rows)
    P_r = np.zeros((nnz, nz), np.float64)
    P_c = np.zeros((nnz, nz), np.float64)
    for j in range(nnz):
        P_r[j, rows[j]] = 1.0
        P_c[j, cols[j]] = 1.0
    P_r = jnp.asarray(P_r, x.dtype)
    P_c = jnp.asarray(P_c, x.dtype)

    out = jnp.sum(K * x[:, None, :, :], axis=2)
    xr = jnp.take(x, jnp.asarray(rows), axis=1)    # [S, nnz, B]
    xc = jnp.take(x, jnp.asarray(cols), axis=1)
    # (E x_{k+1})[i] = sum_j 1[rows_j == i] ev_j x_{k+1}[cols_j]
    out = out.at[:-1].add(
        jnp.einsum("snb,nz->szb", ev * xc[1:], P_r))
    # (E' x_{k-1})[c] = sum_j 1[cols_j == c] ev_j x_{k-1}[rows_j]
    out = out.at[1:].add(
        jnp.einsum("snb,nz->szb", ev * xr[:-1], P_c))
    return out


def make_kkt_solver_se(nw: int, m: int, factor_dtype, residual_dtype,
                       rows, cols, *, interpret: bool = False,
                       force_pallas: bool | None = None):
    """Structured-coupling variant of :func:`make_kkt_solver`.

    The off-diagonal block enters as values `ev [S-1, nnz]` at the
    static sparsity (rows, cols) — the dense E is never materialized
    on the hot path (it was ~half the per-iteration HBM traffic).
    ``solve(K, ev, reg, rhs) -> (d, lin_res)`` with K UNregularized;
    the +/- `reg` diagonal is applied by the factor path itself.
    """
    fd = factor_dtype
    rd = residual_dtype
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    # Duplicate (row, col) pairs would have inconsistent semantics
    # across the routes: the unbatched path places values with
    # last-write-wins `.set`, while the lane matvec / Ruiz / Pallas
    # kernels *accumulate*.  The OBCA coupling pattern is duplicate-
    # free; insist on that instead of silently diverging (ADVICE r3).
    pairs = {(int(r), int(c)) for r, c in zip(rows, cols)}
    if len(pairs) != len(rows):
        raise ValueError(
            "make_kkt_solver_se: duplicate (row, col) pairs in the "
            "coupling pattern — XLA and Pallas routes would disagree"
        )

    @jax.custom_batching.custom_vmap
    def solve(K, ev, reg, rhs):
        S, nz = K.shape[0], K.shape[1]
        E = jnp.zeros((S - 1, nz, nz), K.dtype)
        E = E.at[:, rows, cols].set(ev)
        K_f = (K + jnp.diag(reg)[None, :, :]).astype(fd)
        fac = blocktri.factor(K_f, E.astype(fd), nw=nw)
        return blocktri.solve_gcr(K, E, fac, rhs, m=m,
                                  residual_dtype=rd)

    @solve.def_vmap
    def _solve_vmap(axis_size, in_batched, K, ev, reg, rhs):
        B = axis_size
        kb, eb, gb, rb = in_batched
        if not kb:
            K = jnp.broadcast_to(K[None], (B,) + K.shape)
        if not eb:
            ev = jnp.broadcast_to(ev[None], (B,) + ev.shape)
        if not gb:
            reg = jnp.broadcast_to(reg[None], (B,) + reg.shape)
        if not rb:
            rhs = jnp.broadcast_to(rhs[None], (B,) + rhs.shape)

        use_pallas = force_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if not use_pallas:
            d, lin = jax.vmap(solve.fun)(K, ev, reg, rhs)
            return (d, lin), (True, True)

        from obca_tpu.solver.pallas import blocktri_kernel as bk

        S, nz = K.shape[1], K.shape[2]
        nzp = _round_up(nz, 8)
        Bp = _round_up(B, bk.LANES)
        dt = K.dtype

        with jax.default_matmul_precision("highest"):
            Kt = jnp.transpose(K, (1, 2, 3, 0))          # [S,nz,nz,B]
            evt = jnp.transpose(ev, (1, 2, 0))           # [S-1,nnz,B]
            rt = jnp.transpose(rhs, (1, 2, 0))           # [S,nz,B]
            regT = jnp.transpose(reg, (1, 0))            # [nz,B]
            # ONE padded copy of K (pad diag -1, padded lanes QD
            # identity); the factor adds `reg` in-kernel, the GCR
            # matvec uses the same unregularized array.
            Kt_p = bk.pad_k(Kt, nzp, Bp, nw=nw)
            evt_p = jnp.pad(evt, ((0, 0), (0, 0), (0, Bp - B)))
            reg_p = jnp.pad(regT, ((0, nzp - nz), (0, Bp - B)))
            rt_p = jnp.pad(rt, ((0, 0), (0, nzp - nz), (0, Bp - B)))

            Sinv, Wc, ucols = bk.factor_batched_se(
                Kt_p.astype(fd), evt_p.astype(fd), reg_p.astype(fd),
                rows, cols, nw, interpret=interpret,
            )

            same_rd = np.dtype(rd) == np.dtype(dt)
            Kt_r = Kt_p if same_rd else Kt_p.astype(rd)
            evt_r = evt_p if same_rd else evt_p.astype(rd)

            if np.dtype(fd) == np.dtype(rd):
                # f32 fast path: one fused Pallas call per GCR step
                # does bwd substitution + the true-system matvec
                # (the XLA matvec streamed K at ~280 GB/s vs the
                # kernels' ~800, and each extra dispatch costs
                # ~0.3 ms through the axon tunnel).
                evt_f = evt_p.astype(fd)

                def step_fn(res):
                    y = bk.fwd_se(Sinv, evt_f, res.astype(fd),
                                  rows, cols, interpret=interpret)
                    return bk.bwd_matvec_se(
                        Wc, y, Kt_r.astype(fd), evt_f, rows, cols,
                        ucols, interpret=interpret)
            else:
                def step_fn(res):
                    p = bk.solve_batched_se(
                        Sinv, Wc, evt_p.astype(fd), res.astype(fd),
                        rows, cols, ucols, interpret=interpret,
                    )
                    ap = _matvec_lanes_se(Kt_r, evt_r, rows, cols,
                                          p.astype(rd))
                    return p, ap

            x, lin = _gcr_batched(step_fn, rt_p, m, rd)
        d = jnp.transpose(x[:, :nz, :B], (2, 0, 1)).astype(dt)
        return (d, lin[:B].astype(dt)), (True, True)

    return solve


def make_kkt_solver(nw: int, m: int, factor_dtype, residual_dtype,
                    *, interpret: bool = False,
                    force_pallas: bool | None = None):
    """Build `solve(K, E, reg, rhs) -> (d, lin_res)`.

    K/E: the true (Ruiz-scaled) system in the iterate dtype.
    reg [nz]: the +/- factor regularization added to each diagonal
    block before factoring (sign pattern included by the caller).
    Returns the GCR solution against the *true* system and the inf-norm
    of its final residual (the IPM's step-quality gate).
    """
    fd = factor_dtype
    rd = residual_dtype

    @jax.custom_batching.custom_vmap
    def solve(K, E, reg, rhs):
        K_f = (K + jnp.diag(reg)[None, :, :]).astype(fd)
        fac = blocktri.factor(K_f, E.astype(fd), nw=nw)
        return blocktri.solve_gcr(K, E, fac, rhs, m=m,
                                  residual_dtype=rd)

    @solve.def_vmap
    def _solve_vmap(axis_size, in_batched, K, E, reg, rhs):
        B = axis_size
        kb, eb, gb, rb = in_batched
        if not kb:
            K = jnp.broadcast_to(K[None], (B,) + K.shape)
        if not eb:
            E = jnp.broadcast_to(E[None], (B,) + E.shape)
        if not gb:
            reg = jnp.broadcast_to(reg[None], (B,) + reg.shape)
        if not rb:
            rhs = jnp.broadcast_to(rhs[None], (B,) + rhs.shape)

        use_pallas = force_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if not use_pallas:
            d, lin = jax.vmap(solve.fun)(K, E, reg, rhs)
            return (d, lin), (True, True)

        from obca_tpu.solver.pallas import blocktri_kernel as bk

        S, nz = K.shape[1], K.shape[2]
        nzp = _round_up(nz, 8)
        Bp = _round_up(B, bk.LANES)
        dt = K.dtype

        with jax.default_matmul_precision("highest"):
            Kt = jnp.transpose(K, (1, 2, 3, 0))
            Et = jnp.transpose(E, (1, 2, 3, 0))
            rt = jnp.transpose(rhs, (1, 2, 0))
            regT = jnp.transpose(reg, (1, 0))          # [nz, B]
            eye = jnp.eye(nz, dtype=dt)
            Kt_f = Kt + eye[None, :, :, None] * regT[None, :, None, :]
            Kt_p, Et_p, _ = bk.pad_system(
                Kt_f.astype(fd), Et.astype(fd), [], nzp, Bp, nw=nw,
            )
            Sinv, W = bk.factor_batched(Kt_p, Et_p, nw,
                                        interpret=interpret)

            # True system (residual dtype) for GCR, padded identically
            # but with the pad diag at -1 so residual rows vanish.
            Kt_r, Et_r, _ = bk.pad_system(
                Kt.astype(rd), Et.astype(rd),
                [], nzp, Bp, nw=nw,
            )

            def step_fn(res):
                p = bk.solve_batched(Sinv, W, Et_p, res.astype(fd),
                                     interpret=interpret)
                return p, _matvec_lanes(Kt_r, Et_r, p.astype(rd))

            x, lin = _gcr_batched(step_fn,
                                  jnp.pad(rt, ((0, 0), (0, nzp - nz),
                                               (0, Bp - B))),
                                  m, rd)
        d = jnp.transpose(x[:, :nz, :B], (2, 0, 1)).astype(dt)
        return (d, lin[:B].astype(dt)), (True, True)

    return solve
