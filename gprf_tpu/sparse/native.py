"""ctypes bindings for the native C++ spatial/sparse library.

Builds ``csrc/gprf_native.cpp`` on first use (g++, cached in
``csrc/build/``) and exposes:
  * :func:`range_pairs` — kd-tree fixed-radius pair enumeration
  * :func:`rcm_order` — reverse Cuthill-McKee fill-reducing ordering
  * :class:`NativeCholesky` — sparse Cholesky factor with solve / logdet /
    L-multiply / export

pybind11 is not available in this image, so the ABI is a flat C interface.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CSRC = os.path.join(_REPO_ROOT, "csrc")
_SO_PATH = os.path.join(_CSRC, "build", "libgprf_native.so")

_lock = threading.Lock()
_lib = None


def _build():
    subprocess.run(
        ["make", "-C", _CSRC],
        check=True,
        capture_output=True,
        text=True,
    )


def load_library() -> ctypes.CDLL:
    """Build (if needed) and load the native library; thread-safe."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_CSRC, "gprf_native.cpp")
        if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(src):
            _build()
        lib = ctypes.CDLL(_SO_PATH)

        lib.range_pairs.restype = ctypes.c_int64
        lib.range_pairs.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.rcm_order.restype = None
        lib.rcm_order.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.sparse_chol_factor.restype = ctypes.c_void_p
        lib.sparse_chol_factor.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ]
        lib.sparse_chol_logdet.restype = ctypes.c_double
        lib.sparse_chol_logdet.argtypes = [ctypes.c_void_p]
        lib.sparse_chol_nnz.restype = ctypes.c_int64
        lib.sparse_chol_nnz.argtypes = [ctypes.c_void_p]
        lib.sparse_chol_export.restype = None
        lib.sparse_chol_export.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ]
        lib.sparse_chol_selected_inv.restype = None
        lib.sparse_chol_selected_inv.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
        ]
        lib.sparse_chol_solve.restype = None
        lib.sparse_chol_solve.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        lib.sparse_chol_lmult.restype = None
        lib.sparse_chol_lmult.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        lib.sparse_chol_free.restype = None
        lib.sparse_chol_free.argtypes = [ctypes.c_void_p]

        _lib = lib
        return lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _i32ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def range_pairs(pts: np.ndarray, radius: float):
    """All (i, j), i >= j, with euclidean distance <= radius.

    Returns (rows, cols) int32 arrays covering the lower triangle including
    the diagonal.  Cover-tree ``sparse_training_kernel_matrix`` analog
    (reference ``gprf.py:407``).
    """
    lib = load_library()
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    n, dim = pts.shape
    count = lib.range_pairs(_dptr(pts), n, dim, radius, None, None, 0)
    if count < 0:
        raise RuntimeError(f"range_pairs failed: {count}")
    rows = np.empty(count, dtype=np.int32)
    cols = np.empty(count, dtype=np.int32)
    got = lib.range_pairs(_dptr(pts), n, dim, radius, _i32ptr(rows), _i32ptr(cols), count)
    if got != count:
        raise RuntimeError("range_pairs count mismatch")
    return rows, cols


def rcm_order(n: int, colptr: np.ndarray, rowidx: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee permutation of a symmetric pattern (both
    triangles).  perm[k] = old index placed at new position k."""
    lib = load_library()
    colptr = np.ascontiguousarray(colptr, dtype=np.int64)
    rowidx = np.ascontiguousarray(rowidx, dtype=np.int32)
    perm = np.empty(n, dtype=np.int32)
    lib.rcm_order(n, _i64ptr(colptr), _i32ptr(rowidx), _i32ptr(perm))
    return perm


class NativeCholesky:
    """Sparse Cholesky L L^T = A of an SPD CSC lower triangle."""

    def __init__(self, n, Ap, Ai, Ax):
        lib = load_library()
        Ap = np.ascontiguousarray(Ap, dtype=np.int64)
        Ai = np.ascontiguousarray(Ai, dtype=np.int32)
        Ax = np.ascontiguousarray(Ax, dtype=np.float64)
        self._lib = lib
        self.n = n
        self._h = lib.sparse_chol_factor(n, _i64ptr(Ap), _i32ptr(Ai), _dptr(Ax))
        if not self._h:
            raise np.linalg.LinAlgError("sparse matrix not positive definite")

    def logdet(self) -> float:
        return float(self._lib.sparse_chol_logdet(self._h))

    def nnz(self) -> int:
        return int(self._lib.sparse_chol_nnz(self._h))

    def solve(self, b: np.ndarray) -> np.ndarray:
        """A^-1 b for b of shape [n] or [n, k]."""
        b = np.asarray(b, dtype=np.float64)
        one_d = b.ndim == 1
        B = np.ascontiguousarray(b.reshape(self.n, -1).T.copy())  # [k, n] row-major = per-rhs contiguous
        self._lib.sparse_chol_solve(self._h, _dptr(B), B.shape[0])
        out = B.T
        return out[:, 0] if one_d else out

    def lmult(self, z: np.ndarray) -> np.ndarray:
        """L z for z of shape [n] or [n, k] (prior sampling)."""
        z = np.asarray(z, dtype=np.float64)
        one_d = z.ndim == 1
        Z = np.ascontiguousarray(z.reshape(self.n, -1).T.copy())
        self._lib.sparse_chol_lmult(self._h, _dptr(Z), Z.shape[0])
        out = Z.T
        return out[:, 0] if one_d else out

    def selected_inverse_lower(self):
        """Entries of A^-1 on the lower-triangular pattern of L (Takahashi
        recurrences), as scipy CSC aligned with the factor."""
        import scipy.sparse

        nnz = self.nnz()
        Lp = np.empty(self.n + 1, dtype=np.int64)
        Li = np.empty(nnz, dtype=np.int32)
        Lx = np.empty(nnz, dtype=np.float64)
        self._lib.sparse_chol_export(self._h, _i64ptr(Lp), _i32ptr(Li), _dptr(Lx))
        Zx = np.empty(nnz, dtype=np.float64)
        self._lib.sparse_chol_selected_inv(self._h, _dptr(Zx))
        return scipy.sparse.csc_matrix((Zx, Li, Lp), shape=(self.n, self.n))

    def L(self):
        """Export L as scipy.sparse.csc_matrix."""
        import scipy.sparse

        nnz = self.nnz()
        Lp = np.empty(self.n + 1, dtype=np.int64)
        Li = np.empty(nnz, dtype=np.int32)
        Lx = np.empty(nnz, dtype=np.float64)
        self._lib.sparse_chol_export(self._h, _i64ptr(Lp), _i32ptr(Li), _dptr(Lx))
        return scipy.sparse.csc_matrix((Lx, Li, Lp), shape=(self.n, self.n))

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.sparse_chol_free(h)
            self._h = None
