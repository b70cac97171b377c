"""Native (C++) host-runtime components, loaded via ctypes.

The TPU compute path is jax/XLA/Pallas; the host runtime around it is
native where the reference's was external-native (nibabel's C core +
an 8-GPU multiprocessing farm): `nifti_native.cc` fuses zlib inflate +
header parse + dtype-convert + scl scaling into one pass per volume and
decodes batches on a std::thread pool.

The library is compiled on first use with the system g++ (no pybind11 in
this environment — plain C ABI + ctypes) and cached next to the source;
every entry point has a pure-Python fallback (`hsenet_tpu.data.nifti`), so
the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "nifti_native.cc")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_libnifti.so")
_lock = threading.Lock()
_lib = None
_load_failed = False


def _compile() -> None:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB_PATH, "-lz", "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load() -> Optional[ctypes.CDLL]:
    """Compile (if stale) and load the native library; None on failure."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _load_failed:
            return None
        try:
            if (
                not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            ):
                _compile()
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception:
            _load_failed = True
            return None
        lib.nifti_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.nifti_probe.restype = ctypes.c_int
        lib.nifti_decode_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.nifti_decode_f32.restype = ctypes.c_int
        lib.nifti_decode_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.nifti_decode_batch_f32.restype = ctypes.c_int
        lib.nifti_errstr.argtypes = [ctypes.c_int]
        lib.nifti_errstr.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _check(lib, rc: int, path: str) -> None:
    if rc != 0:
        msg = lib.nifti_errstr(rc).decode()
        raise ValueError(f"{path}: {msg} (native rc={rc})")


def probe(path: str):
    """-> (zyx_shape, zyx_spacing, scl_slope, scl_inter)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native nifti library unavailable")
    shape = (ctypes.c_int64 * 3)()
    spacing = (ctypes.c_float * 3)()
    slope = ctypes.c_float()
    inter = ctypes.c_float()
    rc = lib.nifti_probe(path.encode(), shape, spacing, slope, inter)
    _check(lib, rc, path)
    return (
        tuple(int(s) for s in shape),
        tuple(float(s) for s in spacing),
        float(slope.value),
        float(inter.value),
    )


def decode(path: str, apply_scl: bool = False):
    """Decode one volume -> (float32 (nz, ny, nx) array, zyx_spacing,
    slope, inter). With apply_scl the slope/inter are folded in and
    reported back as (1, 0)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native nifti library unavailable")
    shape, spacing, slope, inter = probe(path)
    out = np.empty(shape, np.float32)
    rc = lib.nifti_decode_f32(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size,
        1 if apply_scl else 0,
    )
    _check(lib, rc, path)
    if apply_scl:
        slope, inter = 1.0, 0.0
    return out, spacing, slope, inter


def decode_batch(
    paths: List[str],
    shape: Tuple[int, int, int],
    apply_scl: bool = False,
    num_threads: Optional[int] = None,
) -> np.ndarray:
    """Thread-pool decode of same-shape volumes -> (N, nz, ny, nx) f32."""
    lib = load()
    if lib is None:
        raise RuntimeError("native nifti library unavailable")
    n = len(paths)
    out = np.empty((n,) + tuple(shape), np.float32)
    vol = int(np.prod(shape))
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    threads = num_threads or min(n, os.cpu_count() or 1)
    rc = lib.nifti_decode_batch_f32(
        c_paths,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vol,
        1 if apply_scl else 0,
        threads,
    )
    _check(lib, rc, paths[0] if paths else "<empty>")
    return out
