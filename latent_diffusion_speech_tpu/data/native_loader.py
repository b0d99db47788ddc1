"""ctypes binding to the native npy batch reader (data/native/npy_batch.cc).

Builds the shared library on first use (g++ -O3, cached keyed on a source
hash so a stale or foreign binary is never dlopen'd); falls back to numpy if
no compiler is available.  The GIL is released for the entire batch read, so
the trainer's host thread keeps feeding the TPU.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

__all__ = ["NativeNpyReader", "native_available"]

_SRC = Path(__file__).parent / "native" / "npy_batch.cc"
_build_lock = threading.Lock()

_DTYPES = {b"f": np.float32, b"e": np.float16, b"i": np.int32, b"q": np.int64}


def _so_path() -> Path:
    # cache keyed on the source hash: a rebuilt source always gets a fresh
    # binary, and checkout-mtime artifacts can't mask a failed rebuild
    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    return _SRC.parent / f"libnpy_batch.{digest}.so"


def _build() -> Optional[Path]:
    so = _so_path()
    if so.exists():
        return so
    with _build_lock:
        if so.exists():
            return so
        try:
            tmp = so.with_suffix(".so.tmp")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
                 str(_SRC), "-o", str(tmp)],
                check=True, capture_output=True,
            )
            tmp.replace(so)  # atomic: concurrent builders race safely
            return so
        except (OSError, subprocess.CalledProcessError):
            return None


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    lib.npy_pool_create.restype = ctypes.c_void_p
    lib.npy_pool_create.argtypes = [ctypes.c_int]
    lib.npy_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.npy_probe.restype = ctypes.c_int
    lib.npy_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_char),
    ]
    lib.npy_read_batch.restype = ctypes.c_int
    lib.npy_read_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_uint64,
        ctypes.c_char_p,
    ]
    lib.npy_read_batch_bf16.restype = ctypes.c_int
    lib.npy_read_batch_bf16.argtypes = lib.npy_read_batch.argtypes
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class NativeNpyReader:
    """Thread-pooled cropped batch reads over npy files."""

    def __init__(self, num_threads: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native npy reader unavailable (no g++?)")
        self._lib = lib
        self._pool = lib.npy_pool_create(num_threads)

    def __del__(self):
        if getattr(self, "_pool", None):
            self._lib.npy_pool_destroy(self._pool)
            self._pool = None

    def probe(self, path: str | Path):
        """Returns (rows, row_bytes, numpy dtype)."""
        rows = ctypes.c_uint64()
        row_bytes = ctypes.c_uint64()
        dtype = ctypes.c_char()
        rc = self._lib.npy_probe(str(path).encode(), ctypes.byref(rows), ctypes.byref(row_bytes), ctypes.byref(dtype))
        if rc != 0:
            raise OSError(f"npy_probe failed ({rc}) for {path}")
        return rows.value, row_bytes.value, _DTYPES[dtype.value]

    def read_batch(
        self,
        paths: Sequence[str | Path],
        starts: Sequence[int],
        count: int,
        inner_shape: Sequence[int],
        dtype=np.float32,
    ) -> np.ndarray:
        """Read rows [start, start+count) of each file. Returns
        (len(paths), count, *inner_shape) array."""
        n = len(paths)
        row_bytes = int(np.prod(inner_shape)) * np.dtype(dtype).itemsize
        out = np.empty((n, count) + tuple(inner_shape), dtype=dtype)
        c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
        c_starts = (ctypes.c_int64 * n)(*[int(s) for s in starts])
        rc = self._lib.npy_read_batch(
            self._pool, c_paths, c_starts, count, n, row_bytes,
            out.ctypes.data_as(ctypes.c_char_p),
        )
        if rc != 0:
            bad = -rc - 1
            raise OSError(f"native batch read failed for {paths[bad]}")
        return out

    def read_batch_bf16(
        self,
        paths: Sequence[str | Path],
        starts: Sequence[int],
        count: int,
        inner_shape: Sequence[int],
    ) -> np.ndarray:
        """Read f32 rows [start, start+count) of each file, converted to
        bfloat16 (round-to-nearest-even, == ``.astype(ml_dtypes.bfloat16)``)
        inside the C++ read pass — no separate numpy cast pass, half the
        output bytes written.  Returns (len(paths), count, *inner_shape)
        bfloat16."""
        import ml_dtypes

        n = len(paths)
        row_bytes_f32 = int(np.prod(inner_shape)) * 4
        out = np.empty((n, count) + tuple(inner_shape), dtype=ml_dtypes.bfloat16)
        c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
        c_starts = (ctypes.c_int64 * n)(*[int(s) for s in starts])
        rc = self._lib.npy_read_batch_bf16(
            self._pool, c_paths, c_starts, count, n, row_bytes_f32,
            out.ctypes.data_as(ctypes.c_char_p),
        )
        if rc != 0:
            bad = -rc - 1
            raise OSError(f"native bf16 batch read failed for {paths[bad]}")
        return out
