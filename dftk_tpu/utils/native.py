"""ctypes loader for the native (C++) host-runtime components.

Builds csrc/*.cpp into a shared library on first use (g++ is part of the
image toolchain); every native entry point has a pure-numpy fallback so the
framework works without a compiler.
"""
import ctypes
import os
import subprocess
import sys

import numpy as np

_LIB = None
_TRIED = False


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def load_native():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    root = _repo_root()
    src = os.path.join(root, "csrc", "symmetry_engine.cpp")
    if not os.path.exists(src):
        return None
    build_dir = os.path.join(root, "build")
    os.makedirs(build_dir, exist_ok=True)
    # name the library after the source content hash: stale binaries can
    # never shadow newer csrc (mtimes are unreliable after git checkout),
    # and we build portable code (no -march=native) since this runs only
    # at setup time
    import hashlib
    with open(src, "rb") as fh:
        tag = hashlib.sha256(fh.read()).hexdigest()[:12]
    lib_path = os.path.join(build_dir, f"libdftk_native-{tag}.so")
    if not os.path.exists(lib_path):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC",
                 "-std=c++17", src, "-o", lib_path],
                check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    lib.lattice_point_group.restype = ctypes.c_int
    lib.lattice_point_group.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.crystal_symmetries.restype = ctypes.c_int
    lib.crystal_symmetries.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_double, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int]
    _LIB = lib
    return _LIB


def native_symmetry_operations(lattice, positions, types, tol=1e-5,
                               max_ops=512):
    """(W list, w list) via the C++ engine, or None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    lattice = np.ascontiguousarray(np.asarray(lattice, dtype=np.float64))
    positions = np.ascontiguousarray(
        np.mod(np.asarray(positions, dtype=np.float64), 1.0))
    types = np.ascontiguousarray(np.asarray(types, dtype=np.int32))
    n_atoms = len(types)

    from .lattice import estimate_integer_lattice_bounds
    norms = np.linalg.norm(lattice, axis=0)
    bound = max(estimate_integer_lattice_bounds(lattice,
                                                norms.max() * (1 + 10 * tol)))

    Wbuf = np.zeros((max_ops, 9), dtype=np.int32)
    n_W = lib.lattice_point_group(
        lattice.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(tol), ctypes.c_int(int(bound)),
        Wbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(max_ops))
    if n_W < 0:
        return None
    if n_atoms == 0:
        return [Wbuf[i].reshape(3, 3) for i in range(n_W)], \
               [np.zeros(3) for _ in range(n_W)]

    Wout = np.zeros((max_ops, 9), dtype=np.int32)
    wout = np.zeros((max_ops, 3), dtype=np.float64)
    n_ops = lib.crystal_symmetries(
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        types.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(n_atoms),
        Wbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(n_W), ctypes.c_double(tol),
        Wout.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        wout.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(max_ops))
    if n_ops < 0:
        return None
    return ([Wout[i].reshape(3, 3).astype(int) for i in range(n_ops)],
            [wout[i].copy() for i in range(n_ops)])
