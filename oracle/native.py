"""ctypes bindings to the native oracle (oracle/cpp/liboracle.so).

Builds on demand via make (g++ baked into the image; no pybind11 —
plain C ABI per project constraints).
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cpp")
_LIB = os.path.join(_DIR, "liboracle.so")


def _ensure_built():
    src_mtime = max(
        os.path.getmtime(os.path.join(_DIR, f))
        for f in ("blocktri.cpp", "verify.cpp", "Makefile")
    )
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < src_mtime:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True)


def load():
    _ensure_built()
    lib = ctypes.CDLL(_LIB)
    lib.blocktri_solve.restype = ctypes.c_int
    lib.verify_trajectory.restype = ctypes.c_int
    return lib


def blocktri_solve(K, E, rhs):
    """Solve the block-tridiagonal system with the C++ reference.

    K [S, nz, nz], E [S-1, nz, nz], rhs [S, nz] -> x [S, nz].
    """
    lib = load()
    K = np.ascontiguousarray(K, dtype=np.float64)
    E = np.ascontiguousarray(E, dtype=np.float64)
    rhs = np.ascontiguousarray(rhs, dtype=np.float64)
    S, nz, _ = K.shape
    x = np.zeros_like(rhs)
    ret = lib.blocktri_solve(
        ctypes.c_int(S), ctypes.c_int(nz),
        K.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        E.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rhs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if ret != 0:
        raise RuntimeError(f"blocktri_solve pivot failure at stage {ret - 1}")
    return x


def verify_trajectory(spec, X, U):
    """Certify a trajectory with the independent C++ feasibility check.

    Returns dict of violation measures (see oracle/cpp/verify.cpp).
    """
    lib = load()
    X = np.ascontiguousarray(X, dtype=np.float64)
    U = np.ascontiguousarray(U, dtype=np.float64)
    N = U.shape[0]
    obs = spec.obstacles
    M, Vmax = obs.num_obs, obs.num_faces
    verts = np.ascontiguousarray(np.asarray(obs.vertices),
                                 dtype=np.float64)
    nverts = np.ascontiguousarray(
        np.asarray(obs.face_mask).sum(axis=1).astype(np.int32)
        * (np.asarray(obs.obs_mask) > 0)
    ).astype(np.int32)
    out = np.zeros(6, dtype=np.float64)

    def dptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    arr = lambda v: np.ascontiguousarray(np.asarray(v), dtype=np.float64)
    ego_g = arr(spec.ego_g)
    x0 = arr(spec.x0)
    xF = arr(spec.xF)
    u_lo = arr(spec.u_lo)
    u_hi = arr(spec.u_hi)
    xy_lo = arr(spec.xy_lo)
    xy_hi = arr(spec.xy_hi)
    lib.verify_trajectory(
        ctypes.c_int(N), ctypes.c_double(float(spec.Ts)),
        ctypes.c_double(float(spec.wheelbase)), dptr(ego_g),
        dptr(X), dptr(U), dptr(x0), dptr(xF),
        dptr(u_lo), dptr(u_hi),
        ctypes.c_double(float(spec.v_lo)),
        ctypes.c_double(float(spec.v_hi)),
        dptr(xy_lo), dptr(xy_hi),
        ctypes.c_int(M), ctypes.c_int(Vmax), dptr(verts),
        nverts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        dptr(out),
    )
    return {
        "max_dyn_defect": out[0],
        "max_bc_err": out[1],
        "max_u_violation": out[2],
        "max_v_violation": out[3],
        "min_clearance": out[4],
        "max_xy_violation": out[5],
    }
