"""ctypes bindings for the native mesh-preprocessing library.

Loads native/libmeshprep.so if present (build with `make -C native`);
every entry point has a numpy fallback, so the native library is a pure
acceleration for very large meshes, never a requirement.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_LIB_PATH = _REPO_ROOT / "native" / "libmeshprep.so"
_lib = None
_load_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.max_valence.restype = ctypes.c_int64
        lib.max_valence.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.build_gather_map.restype = None
        lib.build_gather_map.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.compute_geometry.restype = ctypes.c_int
        lib.compute_geometry.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.rcm_order.restype = ctypes.c_int
        lib.rcm_order.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build(force: bool = False) -> bool:
    """Compile the native library in place (requires g++)."""
    if _LIB_PATH.exists() and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", str(_REPO_ROOT / "native")],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        return False
    global _load_attempted, _lib
    _load_attempted = False
    _lib = None
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def build_gather_map_native(dof_map: np.ndarray, ndof: int) -> Optional[np.ndarray]:
    """Native transposed-incidence build; None if the library is absent."""
    lib = _load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(dof_map, dtype=np.int64).reshape(-1)
    scratch = np.empty(ndof, dtype=np.int64)
    valence = lib.max_valence(
        _ptr(flat, ctypes.c_int64), flat.size, ndof, _ptr(scratch, ctypes.c_int64)
    )
    valence = max(int(valence), 1)
    out = np.empty((ndof, valence), dtype=np.int32)
    lib.build_gather_map(
        _ptr(flat, ctypes.c_int64), flat.size, ndof, valence,
        _ptr(out, ctypes.c_int32), _ptr(scratch, ctypes.c_int64),
    )
    return out


def rcm_order_native(elements: np.ndarray, nnode: int) -> Optional[np.ndarray]:
    """Native reverse Cuthill-McKee ordering; None if the library is absent.

    Returns order with order[new] = old node id."""
    lib = _load()
    if lib is None or not hasattr(lib, "rcm_order"):
        return None
    elements = np.ascontiguousarray(elements, dtype=np.int64)
    nelm = elements.shape[0]
    order = np.empty(nnode, dtype=np.int32)
    scratch = np.empty(2 * nnode + 2 + 2 * nelm, dtype=np.int64)
    rc = lib.rcm_order(
        _ptr(elements, ctypes.c_int64), nelm, nnode,
        _ptr(order, ctypes.c_int32), _ptr(scratch, ctypes.c_int64),
    )
    if rc != 0:
        raise ValueError("element references an out-of-range node id")
    return order.astype(np.int64)


def compute_geometry_native(
    coords: np.ndarray, elements: np.ndarray, dimension: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Native SoA geometry (gvec, inv_len, mid, dof_map); None if absent.

    Raises ValueError on zero-length elements (same contract as the
    numpy path).
    """
    lib = _load()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    elements = np.ascontiguousarray(elements, dtype=np.int64)
    nelm = elements.shape[0]
    gvec = np.empty((nelm, 2 * dimension), dtype=np.float64)
    inv_len = np.empty(nelm, dtype=np.float64)
    mid = np.empty((nelm, dimension), dtype=np.float64)
    dof_map = np.empty((nelm, 2 * dimension), dtype=np.int64)
    bad = np.zeros(1, dtype=np.int64)
    rc = lib.compute_geometry(
        _ptr(coords, ctypes.c_double), _ptr(elements, ctypes.c_int64),
        nelm, dimension,
        _ptr(gvec, ctypes.c_double), _ptr(inv_len, ctypes.c_double),
        _ptr(mid, ctypes.c_double), _ptr(dof_map, ctypes.c_int64),
        _ptr(bad, ctypes.c_int64),
    )
    if rc != 0:
        raise ValueError(
            f"Element with zero initial length detected (element {int(bad[0])})"
        )
    return gvec, inv_len, mid, dof_map
