"""Batch-in-lanes Pallas kernels: block-tridiagonal quasidefinite
factorization / solve over the OBCA horizon.

TPU-native replacement for the reference's MUMPS LDL' factorization
(SURVEY.md §2.2 C10), restructured for the hardware instead of ported:

  * layout: every per-stage block matrix is stored [nz, nz, B] with the
    *scenario batch* B = 128 in the minor (lane) dimension — each VPU
    op processes all 128 scenarios of one (row, col) tile at once;
  * the horizon is the Pallas *grid*: TPU grid steps execute in order,
    so the Schur-complement recursion carries S_{k-1}^{-1} across grid
    steps in a persistent VMEM scratch while BlockSpec pipelining
    double-buffers the HBM streams of K_k / E_k automatically;
  * the per-stage quasidefinite inverse is the same primal-first
    Schur recursion as `blocktri.qd_inv` (matmul-free of LAPACK,
    numerically identical), unrolled at trace time.

The XLA `blocktri` module remains the reference implementation (CPU
oracle, tests); these kernels are its TPU fast path, validated against
it with `interpret=True` in the test suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _i32(v):
    """Index-map values must stay int32: under jax_enable_x64 plain
    python-int map outputs promote to int64, which Mosaic cannot
    legalize ('failed to legalize operation func.return')."""
    return jnp.asarray(v, jnp.int32)


def _eye(n: int, dtype):
    """In-kernel identity.  `jnp.eye` lowers through i64 iotas when
    jax_enable_x64 is on, and Mosaic cannot lay out 64-bit values
    (`layout.h` CHECK bitwidth <= 32) — the root cause of the r4
    mixed-precision on-chip crash (VERDICT r4 next #3).  Explicit
    int32 iotas keep the kernel 64-bit-free under any x64 setting."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(dtype)


_Z = np.int32(0)


def _map4(k):
    return (_i32(k), _Z, _Z, _Z)


def _map3(k):
    return (_i32(k), _Z, _Z)


def _bmm(a, b):
    """C[i, j, :] = sum_k a[i, k, :] * b[k, j, :] — batched small
    matmul with the batch in lanes (VPU broadcast-FMA over k)."""
    acc = a[:, 0:1, :] * b[0, :, :][None]
    for k in range(1, a.shape[1]):
        acc = acc + a[:, k:k + 1, :] * b[k, :, :][None]
    return acc


def _bmv(m, v):
    """y[i, :] = sum_j m[i, j, :] * v[j, :] — batched matvec."""
    return jnp.sum(m * v[None, :, :], axis=1)


def _tp(m):
    """Batched transpose [i, j, :] -> [j, i, :]."""
    return jnp.swapaxes(m, 0, 1)


def _spd_inv_b(A):
    """Batched SPD inverse via the recursive 2x2 block Schur scheme
    (mirrors blocktri.spd_inv, batch in lanes)."""
    n = A.shape[0]
    if n == 1:
        return 1.0 / A
    if n == 2:
        a = A[0:1, 0:1, :]
        b = A[0:1, 1:2, :]
        d = A[1:2, 1:2, :]
        det = a * d - b * b
        top = jnp.concatenate([d, -b], axis=1)
        bot = jnp.concatenate([-b, a], axis=1)
        return jnp.concatenate([top, bot], axis=0) / det
    k = n // 2
    A11 = A[:k, :k, :]
    A12 = A[:k, k:, :]
    A22 = A[k:, k:, :]
    I11 = _spd_inv_b(A11)
    B12 = _bmm(I11, A12)
    S = A22 - _bmm(_tp(A12), B12)
    IS = _spd_inv_b(S)
    off = -_bmm(B12, IS)
    top = I11 + _bmm(_bmm(B12, IS), _tp(B12))
    return jnp.concatenate(
        [
            jnp.concatenate([top, off], axis=1),
            jnp.concatenate([_tp(off), IS], axis=1),
        ],
        axis=0,
    )


def _qd_inv_b(S, nw: int):
    """Batched quasidefinite inverse, primal block first (mirrors
    blocktri.qd_inv — see its docstring for why this order is the
    f32-stable one)."""
    A = S[:nw, :nw, :]
    B = S[:nw, nw:, :]
    D = S[nw:, nw:, :]
    Ainv = _spd_inv_b(A)
    AB = _bmm(Ainv, B)
    Sd = D - _bmm(_tp(B), AB)
    Sdinv = -_spd_inv_b(-Sd)
    X12 = -_bmm(AB, Sdinv)
    X11 = Ainv - _bmm(X12, _tp(AB))
    return jnp.concatenate(
        [
            jnp.concatenate([X11, X12], axis=1),
            jnp.concatenate([_tp(X12), Sdinv], axis=1),
        ],
        axis=0,
    )


# ---------------------------------------------------------------------------
# Factorization kernel.
# ---------------------------------------------------------------------------


def _factor_kernel(nw, K_ref, E_ref, Sinv_ref, W_ref, sprev):
    k = pl.program_id(0)
    Kk = K_ref[0]

    @pl.when(k == 0)
    def _():
        Sinv = _qd_inv_b(Kk, nw)
        Sinv_ref[0] = Sinv
        # W[0] is written (garbage) here and overwritten at k == 1 —
        # the out buffer is only flushed on its last visit.
        W_ref[0] = jnp.zeros_like(Kk)
        sprev[...] = Sinv

    @pl.when(k > 0)
    def _():
        Eprev = E_ref[0]
        Wk = _bmm(sprev[...], Eprev)
        Sk = Kk - _bmm(_tp(Eprev), Wk)
        Sinv = _qd_inv_b(Sk, nw)
        Sinv_ref[0] = Sinv
        W_ref[0] = Wk
        sprev[...] = Sinv


def factor_batched(K, E, nw: int, *, interpret: bool = False):
    """Factor a batch of block-tridiagonal quasidefinite systems.

    Args:
      K: [S, nz, nz, B] diagonal blocks (batch minor).
      E: [S-1, nz, nz, B] upper off-diagonal blocks.
      nw: size of the positive-definite primal sub-block.
    Returns:
      (Sinv [S, nz, nz, B], W [S-1, nz, nz, B]) with
      W[k] = S_k^{-1} E_k (note: indexed by k, i.e. W_{k+1} in the
      blocktri docstring's numbering).
    """
    S, nz, _, B = K.shape
    dt = K.dtype
    # E is indexed at k-1 inside the kernel; pad a dummy leading block
    # so the BlockSpec index map stays in range at k == 0.
    E_pad = jnp.concatenate([jnp.zeros((1, nz, nz, B), dt), E], axis=0)

    grid = (S,)
    out_shape = (
        jax.ShapeDtypeStruct((S, nz, nz, B), dt),
        jax.ShapeDtypeStruct((S, nz, nz, B), dt),
    )
    blk = (1, nz, nz, B)
    Sinv, W_full = pl.pallas_call(
        functools.partial(_factor_kernel, nw),
        grid=grid,
        name="blocktri_factor",
        in_specs=[
            pl.BlockSpec(blk, _map4, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, _map4, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(blk, _map4, memory_space=pltpu.VMEM),
            # W_k lands at slot k-1 (slot 0 is visited at k=0 and k=1;
            # flushed after its last visit, so k=1's value wins).
            pl.BlockSpec(blk,
                         lambda k: (_i32(jnp.maximum(k - 1, 0)),
                                    _Z, _Z, _Z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((nz, nz, B), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(K, E_pad)
    return Sinv, W_full[: S - 1]


# ---------------------------------------------------------------------------
# Solve kernels (forward substitution + backward substitution).
# ---------------------------------------------------------------------------


def _fwd_kernel(E_ref, Sinv_ref, r_ref, y_ref, ycarry):
    k = pl.program_id(0)
    rk = r_ref[0]

    @pl.when(k == 0)
    def _():
        y = _bmv(Sinv_ref[0], rk)
        y_ref[0] = y
        ycarry[...] = y

    @pl.when(k > 0)
    def _():
        yhat = rk - _bmv(_tp(E_ref[0]), ycarry[...])
        y = _bmv(Sinv_ref[0], yhat)
        y_ref[0] = y
        ycarry[...] = y


def _bwd_kernel(W_ref, y_ref, x_ref, xcarry, *, S):
    k = pl.program_id(0)   # walks 0..S-1; stage = S-1-k

    @pl.when(k == 0)
    def _():
        x = y_ref[0]
        x_ref[0] = x
        xcarry[...] = x

    @pl.when(k > 0)
    def _():
        x = y_ref[0] - _bmv(W_ref[0], xcarry[...])
        x_ref[0] = x
        xcarry[...] = x


def solve_batched(Sinv, W, E, r, *, interpret: bool = False):
    """Solve T x = r for a batch given `factor_batched` output.

    r: [S, nz, B] -> x [S, nz, B].
    """
    S, nz, _, B = Sinv.shape
    dt = Sinv.dtype
    r = r.astype(dt)
    E_pad = jnp.concatenate([jnp.zeros((1, nz, nz, B), dt), E], axis=0)

    mblk = (1, nz, nz, B)
    vblk = (1, nz, B)
    y = pl.pallas_call(
        _fwd_kernel,
        grid=(S,),
        name="blocktri_fwd",
        in_specs=[
            pl.BlockSpec(mblk, _map4, memory_space=pltpu.VMEM),
            pl.BlockSpec(mblk, _map4, memory_space=pltpu.VMEM),
            pl.BlockSpec(vblk, _map3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(vblk, _map3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, nz, B), dt),
        scratch_shapes=[pltpu.VMEM((nz, B), dt)],
        interpret=interpret,
    )(E_pad, Sinv, r)

    # Backward pass: walk stages S-1 .. 0.  W[k] multiplies x_{k+1}
    # when solving for stage k, i.e. at grid step g (stage S-1-g) we
    # need W[S-1-g]; pad W with a dummy tail block so g=0 stays in
    # range.
    W_pad = jnp.concatenate([W, jnp.zeros((1, nz, nz, B), dt)], axis=0)
    x = pl.pallas_call(
        functools.partial(_bwd_kernel, S=S),
        grid=(S,),
        name="blocktri_bwd",
        in_specs=[
            pl.BlockSpec(mblk,
                         lambda k: (_i32(S - 1 - k), _Z, _Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(vblk, lambda k: (_i32(S - 1 - k), _Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(vblk,
                               lambda k: (_i32(S - 1 - k), _Z, _Z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, nz, B), dt),
        scratch_shapes=[pltpu.VMEM((nz, B), dt)],
        interpret=interpret,
    )(W_pad, y)
    return x


# ---------------------------------------------------------------------------
# Sparse-coupling (structured-E) kernels.
#
# The OBCA inter-stage coupling E is CONSTANT per scenario with ~11
# nonzeros of nz^2 (nlp.coupling_structure): dynamics identity, tau
# link, rate rows, rate-cost cross term.  Streaming dense [S, nz, nz, B]
# E/W arrays was ~half the per-iteration HBM traffic (round-3 profile);
# these kernels take E as values-at-static-positions [S-1, nnz, B] and
# store W = Sinv_prev E compactly over E's ~10 nonzero COLUMNS only.
# The diagonal regularization is also applied in-kernel, removing the
# separate regularized copy of K.
# ---------------------------------------------------------------------------


def _factor_se_kernel(nw, rows, cidx, ucols, Cp,
                      K_ref, ev_ref, reg_ref, P_ref, Sinv_ref, Wc_ref,
                      sprev):
    # NOTE: no jnp `.at[].add/.set` anywhere — Mosaic has no scatter
    # lowering.  All placements use stacks over static column indices
    # or contractions with the 0/1 selection matrix P (passed as an
    # input: Pallas rejects captured non-scalar constants).
    k = pl.program_id(0)
    Kk = K_ref[0]                                   # [nz, nz, B]
    nz = Kk.shape[0]
    dtype = Kk.dtype
    reg = reg_ref[0]                                # [nz, B]
    eye = _eye(nz, dtype)
    Kk = Kk + eye[:, :, None] * reg[:, None, :]

    @pl.when(k == 0)
    def _():
        Sinv = _qd_inv_b(Kk, nw)
        Sinv_ref[0] = Sinv
        Wc_ref[0] = jnp.zeros(Kk.shape[:1] + (Cp,) + Kk.shape[2:],
                              dtype)
        sprev[...] = Sinv

    @pl.when(k > 0)
    def _():
        ev = ev_ref[0]                              # [nnzp, B], stage k-1
        sp = sprev[...]
        B = Kk.shape[2]
        nnz = len(rows)
        # Scalar-int VALUE indexing lowers to an unsupported Mosaic
        # gather; every pick below is slice-then-broadcast instead.
        ev_j = [ev[j:j + 1, :] for j in range(nnz)]            # [1, B]
        sp_r = [sp[:, r:r + 1, :] for r in rows]               # [nz,1,B]
        # W_{k} = Sinv_{k-1} E_{k-1}, compact over E's nonzero columns:
        # column c_i = sum of ev_j * Sinv[:, rows[j]] over entries with
        # cidx[j] == c_i, built by concatenation (static grouping).
        colbufs = []
        for c_i in range(Cp):
            js = [j for j in range(nnz) if cidx[j] == c_i]
            if js:
                acc = ev_j[js[0]][None] * sp_r[js[0]]
                for j in js[1:]:
                    acc = acc + ev_j[j][None] * sp_r[j]
            else:
                acc = jnp.zeros((nz, 1, B), dtype)
            colbufs.append(acc)
        Wc = jnp.concatenate(colbufs, axis=1)       # [nz, Cp, B]
        # U[a, c] = (E' W)[ucols[a], ucols[c]] — the only nonzero part
        # of the Schur update.
        Wc_r = {r: Wc[r:r + 1, :, :] for r in set(rows)}       # [1,Cp,B]
        urows = []
        for a_i in range(Cp):
            js = [j for j in range(nnz) if cidx[j] == a_i]
            if js:
                acc = ev_j[js[0]][:, None, :] * Wc_r[rows[js[0]]]
                for j in js[1:]:
                    acc = acc + ev_j[j][:, None, :] * Wc_r[rows[j]]
            else:
                acc = jnp.zeros((1, Cp, B), dtype)
            urows.append(acc)
        U = jnp.concatenate(urows, axis=0)          # [Cp, Cp, B]
        # Scatter U into the dense stage block via the 0/1 selection
        # matrix P [Cp, nz] (kernel input): U_full = P' U P.
        P_in = P_ref[...]                           # [Cp, nz]
        Pb = jnp.broadcast_to(P_in[:, :, None], (Cp, nz, B))
        PbT = jnp.broadcast_to(
            jnp.swapaxes(P_in, 0, 1)[:, :, None], (nz, Cp, B))
        U_full = _bmm(_bmm(PbT, U), Pb)             # [nz, nz, B]
        Sinv = _qd_inv_b(Kk - U_full, nw)
        Sinv_ref[0] = Sinv
        Wc_ref[0] = Wc
        sprev[...] = Sinv


def factor_batched_se(K, ev, reg, rows, cols, nw: int, *,
                      interpret: bool = False):
    """Sparse-coupling factorization.

    Args:
      K   [S, nz, nz, B] UNregularized diagonal blocks (batch minor).
      ev  [S-1, nnz, B]  E values at (rows, cols).
      reg [nz, B]        diagonal regularization added in-kernel.
      rows/cols: static python int sequences (the E sparsity).
    Returns (Sinv [S, nz, nz, B], Wc [S-1, nz, Cp, B], ucols) with
      Wc[k][:, c_i] = (S_k^{-1} E_k)[:, ucols[c_i]].
    """
    S, nz, _, B = K.shape
    dt = K.dtype
    rows = [int(r) for r in rows]
    ucols = sorted({int(c) for c in cols})
    cidx = [ucols.index(int(c)) for c in cols]
    Cp = _round_up(len(ucols), 8)

    nnz = ev.shape[1]
    nnzp = _round_up(nnz, 8)
    ev = jnp.pad(ev.astype(dt), ((1, 0), (0, nnzp - nnz), (0, 0)))
    P_np = np.zeros((Cp, nz), np.float64)
    for c_i, c in enumerate(ucols):
        P_np[c_i, c] = 1.0
    P = jnp.asarray(P_np, dt)

    grid = (S,)
    blk = (1, nz, nz, B)
    out_shape = (
        jax.ShapeDtypeStruct((S, nz, nz, B), dt),
        jax.ShapeDtypeStruct((S, nz, Cp, B), dt),
    )
    Sinv, Wc_full = pl.pallas_call(
        functools.partial(_factor_se_kernel, nw, rows, cidx, ucols, Cp),
        grid=grid,
        name="blocktri_factor_se",
        in_specs=[
            pl.BlockSpec(blk, _map4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nnzp, B), _map3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nz, B), lambda k: (_Z, _Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, nz), lambda k: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(blk, _map4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nz, Cp, B),
                         lambda k: (_i32(jnp.maximum(k - 1, 0)),
                                    _Z, _Z, _Z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((nz, nz, B), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(K, ev, reg[None], P)
    return Sinv, Wc_full[: S - 1], ucols


def _fwd_se_kernel(rows, Sinv_ref, ev_ref, r_ref, Pc_ref, y_ref,
                   ycarry):
    k = pl.program_id(0)
    rk = r_ref[0]

    @pl.when(k == 0)
    def _():
        y = _bmv(Sinv_ref[0], rk)
        y_ref[0] = y
        ycarry[...] = y

    @pl.when(k > 0)
    def _():
        ev = ev_ref[0]                              # stage k-1 values
        yc = ycarry[...]
        # yhat = r_k - E'_{k-1} y_{k-1}: per-entry contributions
        # t[j] = ev_j * y_{k-1}[rows_j] placed at row cols[j] via the
        # one-hot matrix P_c [nnzp, nz] (input — Mosaic has neither
        # scatter nor captured-constant support; picks are slices, not
        # scalar indexing, which would lower to a gather):
        # sub = sum_j P_c[j] * t[j].
        t = jnp.concatenate(
            [ev[j:j + 1, :] * yc[rows[j]:rows[j] + 1, :]
             for j in range(len(rows))], axis=0
        )                                           # [nnz, B]
        Pc = Pc_ref[...]                            # [nnzp, nz]
        # partial-slice + newaxis getitem lowers via gather in Mosaic;
        # slice first, expand_dims (reshape) second.
        Pc_sl = jax.lax.slice_in_dim(Pc, 0, len(rows), axis=0)
        sub = jnp.sum(jnp.expand_dims(Pc_sl, 2) * t[:, None, :],
                      axis=0)
        y = _bmv(Sinv_ref[0], rk - sub)
        y_ref[0] = y
        ycarry[...] = y


def _bwd_se_kernel(ucols, Wc_ref, y_ref, x_ref, xcarry):
    k = pl.program_id(0)   # walks 0..S-1; stage = S-1-k

    @pl.when(k == 0)
    def _():
        x = y_ref[0]
        x_ref[0] = x
        xcarry[...] = x

    @pl.when(k > 0)
    def _():
        xc = xcarry[...]
        Wc = Wc_ref[0]
        acc = y_ref[0]
        for c_i, c in enumerate(ucols):
            # slice picks (scalar indexing would lower to a gather)
            acc = acc - jnp.squeeze(Wc[:, c_i:c_i + 1, :], axis=1) \
                * xc[c:c + 1, :]
        x_ref[0] = acc
        xcarry[...] = acc


def solve_batched_se(Sinv, Wc, ev, r, rows, cols, ucols, *,
                     interpret: bool = False):
    """Solve T x = r given `factor_batched_se` output; r [S, nz, B]."""
    S, nz, _, B = Sinv.shape
    Cp = Wc.shape[2]
    dt = Sinv.dtype
    r = r.astype(dt)
    rows = [int(r_) for r_ in rows]
    cols = [int(c) for c in cols]

    nnz = ev.shape[1]
    nnzp = _round_up(nnz, 8)
    ev_pad = jnp.pad(ev.astype(dt), ((1, 0), (0, nnzp - nnz), (0, 0)))
    Pc_np = np.zeros((nnzp, nz), np.float64)
    for j in range(nnz):
        Pc_np[j, cols[j]] = 1.0
    Pc = jnp.asarray(Pc_np, dt)

    vblk = (1, nz, B)
    y = pl.pallas_call(
        functools.partial(_fwd_se_kernel, rows),
        grid=(S,),
        name="blocktri_fwd_se",
        in_specs=[
            pl.BlockSpec((1, nz, nz, B), _map4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nnzp, B), _map3, memory_space=pltpu.VMEM),
            pl.BlockSpec(vblk, _map3, memory_space=pltpu.VMEM),
            pl.BlockSpec((nnzp, nz), lambda k: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(vblk, _map3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, nz, B), dt),
        scratch_shapes=[pltpu.VMEM((nz, B), dt)],
        interpret=interpret,
    )(Sinv, ev_pad, r, Pc)

    Wc_pad = jnp.concatenate([Wc, jnp.zeros((1, nz, Cp, B), dt)], axis=0)
    x = pl.pallas_call(
        functools.partial(_bwd_se_kernel, ucols),
        grid=(S,),
        name="blocktri_bwd_se",
        in_specs=[
            pl.BlockSpec((1, nz, Cp, B),
                         lambda k: (_i32(S - 1 - k), _Z, _Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(vblk, lambda k: (_i32(S - 1 - k), _Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(vblk,
                               lambda k: (_i32(S - 1 - k), _Z, _Z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, nz, B), dt),
        scratch_shapes=[pltpu.VMEM((nz, B), dt)],
        interpret=interpret,
    )(Wc_pad, y)
    return x


# ---------------------------------------------------------------------------
# Fused backward-substitution + matvec kernel (f32 fast path).
#
# Each GCR refinement step needs p = M^{-1} res (fwd + bwd
# substitution) and Ap = T p (block-tridiagonal matvec).  Running the
# matvec as XLA ops costs a full K stream at XLA-elementwise bandwidth
# (~280 GB/s measured on this platform vs ~800 GB/s reached by the
# Pallas streams — tools/kernel_bench.py) plus one extra dispatch
# (~0.3 ms through the axon tunnel).  This kernel fuses the backward
# substitution with a one-stage-LAGGED matvec: walking stages s
# descending, once p_s is computed the row Ap_{s+1} = K_{s+1} p_{s+1}
# + E_{s+1} p_{s+2} + E_s' p_s has all three operands in VMEM carries
# — no second pass, no dynamic indexing, one extra grid step for
# Ap_0.  K rides the same descending stream at kernel bandwidth.
# ---------------------------------------------------------------------------


def _bwdmv_se_kernel(rows, cols, ucols, S,
                     Wc_ref, y_ref, K_ref, evA_ref, evB_ref, Pc_ref,
                     Pr_ref, p_ref, ap_ref, c1, c2):
    """Grid g in [0, S]: p-stage s = S-1-g (g < S), Ap-stage t = S-g
    (g >= 1).  Carries: c1 = p_{s+1}, c2 = p_{s+2} (before rotation).
    evA holds E_t values (= ev_full[t+1]), evB holds E_{t-1} values
    (= ev_full[t]); ev_full is ev with a zero block at both ends."""
    g = pl.program_id(0)
    nnz = len(rows)

    # ---- backward substitution: p_s (g < S) ----
    @pl.when(g < S)
    def _():
        acc = y_ref[0]
        Wc = Wc_ref[0]
        pc1 = c1[...]
        for c_i, c in enumerate(ucols):
            term = jnp.squeeze(Wc[:, c_i:c_i + 1, :], axis=1) \
                * pc1[c:c + 1, :]
            acc = jnp.where(g > 0, acc - term, acc)
        p_ref[0] = acc

    # ---- lagged matvec row: Ap_t, t = S-g (g >= 1) ----
    @pl.when(g > 0)
    def _():
        p_t = c1[...]
        p_t1 = c2[...]                    # p_{t+1} (garbage at t=S-1's
        #                                   first use is masked below)
        Kt = K_ref[0]
        out = _bmv(Kt, p_t)
        # + E_t p_{t+1} (rows of E_t): skip at t = S-1 (no E_{S-1}..).
        evA = evA_ref[0]
        xc = jnp.concatenate(
            [evA[j:j + 1, :] * p_t1[cols[j]:cols[j] + 1, :]
             for j in range(nnz)], axis=0)          # [nnz, B]
        Pr = jax.lax.slice_in_dim(Pr_ref[...], 0, nnz, axis=0)
        add_r = jnp.sum(jnp.expand_dims(Pr, 2) * xc[:, None, :],
                        axis=0)
        # zeros_like, not the literal 0.0: under x64 the Python float
        # enters the kernel as a weak f64 scalar (Mosaic layout CHECK).
        out = out + jnp.where(g > 1, add_r, jnp.zeros_like(add_r))
        # + E_{t-1}' p_{t-1}: p_{t-1} = p_s written this step (g < S).
        @pl.when(g < S)
        def _():
            evB = evB_ref[0]
            p_s = p_ref[0]
            tc = jnp.concatenate(
                [evB[j:j + 1, :] * p_s[rows[j]:rows[j] + 1, :]
                 for j in range(nnz)], axis=0)
            Pc = jax.lax.slice_in_dim(Pc_ref[...], 0, nnz, axis=0)
            ap_ref[0] = out + jnp.sum(
                jnp.expand_dims(Pc, 2) * tc[:, None, :], axis=0)

        @pl.when(g == S)
        def _():
            ap_ref[0] = out

    # ---- rotate carries ----
    @pl.when(g < S)
    def _():
        c2[...] = c1[...]
        c1[...] = p_ref[0]


def bwd_matvec_se(Wc, y, K, ev, rows, cols, ucols, *,
                  interpret: bool = False):
    """Fused backward substitution + block-tridiagonal matvec.

    Args:
      Wc [S-1, nz, Cp, B] compact W from factor_batched_se.
      y  [S, nz, B] forward-substitution output.
      K  [S, nz, nz, B] UNregularized (Ruiz-scaled) diagonal blocks —
         the true system the GCR refines against.
      ev [S-1, nnz, B] coupling values.
    Returns (p [S, nz, B], Ap [S, nz, B]) with p = L'^{-1} y and
    Ap = T p.
    """
    S, nz, _, B = K.shape
    Cp = Wc.shape[2]
    dt = K.dtype
    y = y.astype(dt)
    rows = [int(r_) for r_ in rows]
    cols = [int(c) for c in cols]
    nnz = ev.shape[1]
    nnzp = _round_up(nnz, 8)
    # ev_full[k] = E_{k-1} values; zero blocks at both ends.
    ev_full = jnp.pad(ev.astype(dt), ((1, 1), (0, nnzp - nnz), (0, 0)))
    Pc_np = np.zeros((nnzp, nz), np.float64)
    Pr_np = np.zeros((nnzp, nz), np.float64)
    for j in range(nnz):
        Pc_np[j, cols[j]] = 1.0
        Pr_np[j, rows[j]] = 1.0
    Pc = jnp.asarray(Pc_np, dt)
    Pr = jnp.asarray(Pr_np, dt)
    Wc_pad = jnp.concatenate([Wc, jnp.zeros((1, nz, Cp, B), dt)],
                             axis=0)

    def m_p(g):          # p-stage s = S-1-g, clamped
        return (_i32(jnp.clip(S - 1 - g, 0, S - 1)), _Z, _Z)

    def m_p4(g):
        return (_i32(jnp.clip(S - 1 - g, 0, S - 1)), _Z, _Z, _Z)

    def m_t4(g):         # Ap-stage t = S-g, clamped
        return (_i32(jnp.clip(S - g, 0, S - 1)), _Z, _Z, _Z)

    def m_t(g):
        return (_i32(jnp.clip(S - g, 0, S - 1)), _Z, _Z)

    def m_evA(g):        # ev_full[t+1], t = S-g
        return (_i32(jnp.clip(S - g + 1, 0, S)), _Z, _Z)

    def m_evB(g):        # ev_full[t]
        return (_i32(jnp.clip(S - g, 0, S)), _Z, _Z)

    p, Ap = pl.pallas_call(
        functools.partial(_bwdmv_se_kernel, rows, cols, ucols, S),
        grid=(S + 1,),
        name="blocktri_bwdmv_se",
        in_specs=[
            pl.BlockSpec((1, nz, Cp, B), m_p4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nz, B), m_p, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nz, nz, B), m_t4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nnzp, B), m_evA, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nnzp, B), m_evB, memory_space=pltpu.VMEM),
            pl.BlockSpec((nnzp, nz), lambda g: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nnzp, nz), lambda g: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, nz, B), m_p, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nz, B), m_t, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, nz, B), dt),
            jax.ShapeDtypeStruct((S, nz, B), dt),
        ),
        scratch_shapes=[pltpu.VMEM((nz, B), dt),
                        pltpu.VMEM((nz, B), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Wc_pad, y, K, ev_full, ev_full, Pc, Pr)
    return p, Ap


def fwd_se(Sinv, ev, r, rows, cols, *, interpret: bool = False):
    """Forward substitution only (the first half of solve_batched_se);
    used by the fused GCR step, which pairs it with bwd_matvec_se."""
    S, nz, _, B = Sinv.shape
    dt = Sinv.dtype
    r = r.astype(dt)
    rows = [int(r_) for r_ in rows]
    cols = [int(c) for c in cols]
    nnz = ev.shape[1]
    nnzp = _round_up(nnz, 8)
    ev_pad = jnp.pad(ev.astype(dt), ((1, 0), (0, nnzp - nnz), (0, 0)))
    Pc_np = np.zeros((nnzp, nz), np.float64)
    for j in range(nnz):
        Pc_np[j, cols[j]] = 1.0
    Pc = jnp.asarray(Pc_np, dt)
    vblk = (1, nz, B)
    return pl.pallas_call(
        functools.partial(_fwd_se_kernel, rows),
        grid=(S,),
        name="blocktri_fwd_se",
        in_specs=[
            pl.BlockSpec((1, nz, nz, B), _map4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nnzp, B), _map3, memory_space=pltpu.VMEM),
            pl.BlockSpec(vblk, _map3, memory_space=pltpu.VMEM),
            pl.BlockSpec((nnzp, nz), lambda k: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(vblk, _map3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, nz, B), dt),
        scratch_shapes=[pltpu.VMEM((nz, B), dt)],
        interpret=interpret,
    )(Sinv, ev_pad, r, Pc)


# ---------------------------------------------------------------------------
# Padding helpers (nz to sublane multiples, B to lane multiples).
# ---------------------------------------------------------------------------


def pad_k(K, nz_pad: int, B_pad: int, nw: int = 0):
    """Pad diagonal blocks [.., nz, nz, B] to (nz_pad, B_pad).  Padded
    diagonal entries are set to -1 (appended at the dual end: the padded
    system stays quasidefinite with the same nw) and padded *lanes* get
    the (+1 on the first nw rows, -1 after) quasidefinite identity so
    the factorization stays finite there (their solutions are
    discarded).  The sparse-coupling path pads K alone with this —
    fabricating a dense zero E just to reuse :func:`pad_system` would
    re-materialize the stream the structured path exists to avoid."""
    S, nz, _, B = K.shape
    dz, db = nz_pad - nz, B_pad - B
    if dz == 0 and db == 0:
        return K
    K = jnp.pad(K, ((0, 0), (0, dz), (0, dz), (0, db)))
    idx = np.arange(nz, nz_pad)
    if dz:
        K = K.at[:, idx, idx, :].set(-1.0)
    if db:
        ii = np.arange(nz_pad)
        dvals = jnp.where(jnp.arange(nz_pad) < nw, 1.0, -1.0).astype(
            K.dtype
        )
        K = K.at[:, ii, ii, B:].set(dvals[None, :, None])
    return K


def pad_system(K, E, rhs_list, nz_pad: int, B_pad: int, nw: int = 0):
    """Pad a full (K, E, rhs) system: K via :func:`pad_k`, E with zeros,
    rhs rows with 0 — padded solution entries are exactly 0."""
    S, nz, _, B = K.shape
    dz, db = nz_pad - nz, B_pad - B
    if dz == 0 and db == 0:
        return K, E, rhs_list
    K = pad_k(K, nz_pad, B_pad, nw=nw)
    E = jnp.pad(E, ((0, 0), (0, dz), (0, dz), (0, db)))
    rhs_list = [jnp.pad(r, ((0, 0), (0, dz), (0, db))) for r in rhs_list]
    return K, E, rhs_list
