"""Block-tridiagonal quasidefinite KKT factorization and solve.

TPU-native equivalent of the reference's sparse symmetric-indefinite
LDL' (MUMPS under Ipopt — SURVEY.md §2.2 C10): the OBCA NLP's KKT
system, ordered stage-wise, is block-tridiagonal

    T = [ K_0  E_0            ]
        [ E_0' K_1  E_1       ]
        [      E_1' K_2  ...  ]

with nz x nz dense blocks (nz ~ 56 for 3 obstacles).  The interior-point
layer regularizes every diagonal block to symmetric *quasidefinite* form
(primal block + delta_w I positive, dual block <= -delta_c), for which a
fixed-order block-Thomas elimination is stable without pivoting
(Vanderbei 1995; same property modern IPM codes rely on).

Forward elimination (a Riccati-like backward pass run forward in k):
    S_0 = K_0,   S_k = K_k - E_{k-1}' S_{k-1}^{-1} E_{k-1}
Solve:
    yhat_0 = r_0,          yhat_k = r_k - E_{k-1}' S_{k-1}^{-1} yhat_{k-1}
    x_{S-1} = S_{S-1}^{-1} yhat_{S-1}
    x_k = S_k^{-1} yhat_k - W_{k+1} x_{k+1},   W_k := S_{k-1}^{-1} E_{k-1}

Explicit inverses are stored so every step of the back pass is a batched
small matmul (MXU-friendly); `solve_refined` adds iterative refinement
for low-precision factorizations (SURVEY.md §7 hard part 1).

Everything is per-scenario; batch via `jax.vmap` from the caller.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _full_precision(fn):
    """Force true-f32 matmuls (TPU DEFAULT runs f32 contractions in
    bfloat16 passes, which destroys the pivoting-free factorization —
    observed round-1/2: 0/8 TPU convergence under DEFAULT, 8/8 under
    HIGHEST).  Correctness-critical linear algebra must not depend on
    the caller's global precision config."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


class BlockTriFactor(NamedTuple):
    Sinv: jax.Array  # [S, nz, nz]  inverses of the Schur complements
    W: jax.Array     # [S-1, nz, nz] W_k = S_{k-1}^{-1} E_{k-1}
    E: jax.Array     # [S-1, nz, nz] the off-diagonal blocks (for matvec)


@_full_precision
def spd_inv(A):
    """Explicit inverse of a symmetric positive-definite matrix via
    recursive 2x2 block Schur complements — pure matmuls, no LU/Cholesky
    primitives (the TPU backend only implements those for f32, and
    matmul-only code is what the MXU wants).  Static-shape recursion,
    unrolled at trace time; numerically equivalent to block Cholesky.
    """
    n = A.shape[-1]
    if n == 1:
        return 1.0 / A
    if n == 2:
        a = A[..., 0, 0]
        b = A[..., 0, 1]
        d = A[..., 1, 1]
        det = a * d - b * b
        inv = jnp.stack(
            [jnp.stack([d, -b], -1), jnp.stack([-b, a], -1)], -2
        )
        return inv / det[..., None, None]
    k = n // 2
    A11 = A[..., :k, :k]
    A12 = A[..., :k, k:]
    A22 = A[..., k:, k:]
    I11 = spd_inv(A11)
    B12 = I11 @ A12                                   # A11^{-1} A12
    S = A22 - jnp.swapaxes(A12, -1, -2) @ B12         # SPD Schur
    IS = spd_inv(S)
    off = -B12 @ IS
    top = I11 + B12 @ IS @ jnp.swapaxes(B12, -1, -2)
    return jnp.concatenate(
        [
            jnp.concatenate([top, off], axis=-1),
            jnp.concatenate([jnp.swapaxes(off, -1, -2), IS], axis=-1),
        ],
        axis=-2,
    )


@_full_precision
def qd_inv(S, nw: int):
    """Explicit inverse of a symmetric *quasidefinite* matrix
    S = [[A, B], [B', D]] with A (nw x nw) positive definite and D
    negative definite (the IPM guarantees this by regularization;
    Vanderbei 1995 guarantees stability of the fixed-order elimination).

    Elimination order matters in low precision: the *primal* block A is
    eliminated first.  A is unit-scaled after Ruiz equilibration, so
    the dual Schur complement Sd = D - B' A^{-1} B has O(1) entries.
    The reverse order (invert D first) forms A + B (-D)^{-1} B' ~
    J'J / delta_factor on equality rows — condition ~1e8, which is what
    broke the f32 factorization at small barrier mu in round 1.
    """
    A = S[..., :nw, :nw]
    B = S[..., :nw, nw:]
    D = S[..., nw:, nw:]
    Ainv = spd_inv(A)
    AB = Ainv @ B                                      # A^{-1} B
    Sd = D - jnp.swapaxes(B, -1, -2) @ AB              # negative definite
    Sdinv = -spd_inv(-Sd)
    X12 = -AB @ Sdinv
    X11 = Ainv - X12 @ jnp.swapaxes(AB, -1, -2)
    return jnp.concatenate(
        [
            jnp.concatenate([X11, X12], axis=-1),
            jnp.concatenate([jnp.swapaxes(X12, -1, -2), Sdinv], axis=-1),
        ],
        axis=-2,
    )


@_full_precision
def factor(K, E, nw: int | None = None) -> BlockTriFactor:
    """Factor the block-tridiagonal matrix given diagonal blocks
    K [S, nz, nz] and upper off-diagonal blocks E [S-1, nz, nz].

    `nw` is the size of the positive (primal) part of each quasidefinite
    diagonal block; if None, the dense LU inverse is used (CPU only —
    the TPU backend lacks f64 LU).
    """
    inv = (lambda M: qd_inv(M, nw)) if nw is not None else jnp.linalg.inv
    Sinv0 = inv(K[0])

    def body(Sinv_prev, inputs):
        K_k, E_prev = inputs
        W_k = Sinv_prev @ E_prev
        S_k = K_k - jnp.swapaxes(E_prev, -1, -2) @ W_k
        Sinv_k = inv(S_k)
        return Sinv_k, (Sinv_k, W_k)

    _, (Sinv_rest, W) = jax.lax.scan(body, Sinv0, (K[1:], E))
    Sinv = jnp.concatenate([Sinv0[None], Sinv_rest], axis=0)
    return BlockTriFactor(Sinv=Sinv, W=W, E=E)


@_full_precision
def solve(fac: BlockTriFactor, r):
    """Solve T x = r for r [S, nz] given a factorization."""
    Sinv, W, E = fac

    def fwd(yprev_solved, inputs):
        # yprev_solved = S_{k-1}^{-1} yhat_{k-1}
        r_k, E_prev, Sinv_k = inputs
        yhat_k = r_k - jnp.swapaxes(E_prev, -1, -2) @ yprev_solved
        y_k = Sinv_k @ yhat_k
        return y_k, y_k

    y0 = Sinv[0] @ r[0]
    _, ys = jax.lax.scan(fwd, y0, (r[1:], E, Sinv[1:]))
    y = jnp.concatenate([y0[None], ys], axis=0)  # y_k = S_k^{-1} yhat_k

    def bwd(x_next, inputs):
        y_k, W_next = inputs
        x_k = y_k - W_next @ x_next
        return x_k, x_k

    xS = y[-1]
    _, xs = jax.lax.scan(bwd, xS, (y[:-1], W), reverse=True)
    return jnp.concatenate([xs, xS[None]], axis=0)


@_full_precision
def matvec(K, E, x):
    """Block-tridiagonal matvec T x for x [S, nz]."""
    Et = jnp.swapaxes(E, -1, -2)
    out = jnp.einsum("kij,kj->ki", K, x)
    out = out.at[:-1].add(jnp.einsum("kij,kj->ki", E, x[1:]))
    out = out.at[1:].add(jnp.einsum("kij,kj->ki", Et, x[:-1]))
    return out


@_full_precision
def solve_gcr(K, E, fac: BlockTriFactor, r, m: int = 8,
              residual_dtype=None):
    """Solve T x = r by GCR(m) (truncated Generalized Conjugate
    Residual), right-preconditioned by the block-tridiagonal factor.

    Richardson-style refinement (`solve_refined`) can stall on the
    *indefinite* saddle-point KKT when the low-precision factor is a
    poor preconditioner (observed: residual floor ~1e-1 at small
    barrier mu in f32 — the round-1 TPU convergence failure).  GCR
    minimizes ||r - T x|| over the full preconditioned Krylov space, so
    the residual is monotone and the method cannot stall the way
    damped Richardson does.  m is small and static (unrolled);
    residual arithmetic runs in `residual_dtype` (f64 on the TPU
    mixed path — elementwise + tiny matvecs, cheap even emulated),
    preconditioner solves in the factor's dtype (the MXU path).

    Returns (x in r.dtype, inf-norm of the final true residual).
    """
    rd = residual_dtype or r.dtype
    fd = fac.Sinv.dtype
    tiny = jnp.asarray(jnp.finfo(rd).tiny, rd)
    Krd, Erd, rrd = K.astype(rd), E.astype(rd), r.astype(rd)
    x = jnp.zeros_like(rrd)
    res = rrd
    ps, aps = [], []
    for _ in range(m):
        p = solve(fac, res.astype(fd)).astype(rd)
        ap = matvec(Krd, Erd, p)
        for pj, apj in zip(ps, aps):   # apj are orthonormal
            beta = jnp.sum(ap * apj)
            p = p - beta * pj
            ap = ap - beta * apj
        nrm = jnp.sqrt(jnp.sum(ap * ap))
        inv = jnp.where(nrm > tiny, 1.0 / jnp.maximum(nrm, tiny), 0.0)
        p = p * inv
        ap = ap * inv
        alpha = jnp.sum(res * ap)
        x = x + alpha * p
        res = res - alpha * ap
        ps.append(p)
        aps.append(ap)
    return x.astype(r.dtype), jnp.max(jnp.abs(res))


@_full_precision
def solve_refined(K, E, fac: BlockTriFactor, r, iters: int = 1,
                  residual_dtype=None):
    """Solve with iterative refinement: the factorization may be in a
    lower precision than the system/RHS (the TPU mixed-precision path:
    f32 factor + f64 iterate).  Residuals are computed in
    `residual_dtype` (default: r.dtype), correction solves run entirely
    in the factor's dtype (keeping the triangular-solve matmuls on the
    fast MXU path), and the solution accumulates in r.dtype.
    """
    rd = residual_dtype or r.dtype
    fd = fac.Sinv.dtype
    Krd, Erd, rrd = K.astype(rd), E.astype(rd), r.astype(rd)
    x = jnp.zeros_like(r)

    def body(x, _):
        res = rrd - matvec(Krd, Erd, x.astype(rd))
        dx = solve(fac, res.astype(fd)).astype(rd)
        # Minimal-residual damping: omega minimizes ||res - omega*T dx||,
        # so the refinement is monotone in the residual norm and cannot
        # diverge even when the regularized factor is a poor
        # preconditioner (ill-conditioned small-mu KKT systems — the
        # failure mode of plain Richardson refinement in low precision).
        Tdx = matvec(Krd, Erd, dx)
        den = jnp.sum(Tdx * Tdx)
        omega = jnp.where(den > 0, jnp.sum(res * Tdx) / jnp.maximum(
            den, jnp.finfo(rd).tiny), 0.0)
        return x + (omega * dx).astype(x.dtype), None

    x, _ = jax.lax.scan(body, x, None, length=iters + 1)
    return x


def dense_from_blocks(K, E):
    """Materialize the dense matrix (tests / small-N debugging only)."""
    S, nz, _ = K.shape
    T = jnp.zeros((S * nz, S * nz), K.dtype)
    for k in range(S):
        T = T.at[k * nz:(k + 1) * nz, k * nz:(k + 1) * nz].set(K[k])
    for k in range(S - 1):
        T = T.at[k * nz:(k + 1) * nz,
                 (k + 1) * nz:(k + 2) * nz].set(E[k])
        T = T.at[(k + 1) * nz:(k + 2) * nz,
                 k * nz:(k + 1) * nz].set(E[k].T)
    return T
