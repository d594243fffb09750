"""Batched solver core: interior-point method + block-tridiagonal KKT.

TPU-native replacement for the reference's native solver surface
(SURVEY.md §2.2 C9/C10): Ipopt (C++ primal-dual interior point) and
MUMPS (sparse symmetric-indefinite LDL') become a batched, fixed-shape
interior-point loop (`ipm`) over a block-tridiagonal quasidefinite KKT
factorization (`blocktri`).
"""

from obca_tpu.solver import blocktri  # noqa: F401
