"""ctypes binding for the native C++ store reader (csrc/aio_reader.cc).

Provides O_DIRECT positioned reads of expert records — the cold-fetch path
that bypasses the page cache (reference: O_DIRECT pread,
/root/reference/core/aio/archer_aio_utils.cpp:16-25) — plus a thread-pooled
batch read. Auto-builds the shared library on first use if a toolchain is
present; callers fall back to the mmap reader when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

from moe_infinity_tpu.utils.logger import get_logger

logger = get_logger("native")

_CSRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libmtstore.so")
_lib = None
_lib_lock = threading.Lock()

ALIGN = 4096


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _CSRC, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception as e:  # no toolchain / build failure
                logger.warning("native store build failed: %s", e)
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning("native store load failed: %s", e)
            return None
        lib.mtstore_open.restype = ctypes.c_void_p
        lib.mtstore_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.mtstore_read.restype = ctypes.c_int
        lib.mtstore_read.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p,
        ]
        lib.mtstore_read_batch.restype = ctypes.c_int
        lib.mtstore_read_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.mtstore_close.argtypes = [ctypes.c_void_p]
        lib.mtstore_is_direct.restype = ctypes.c_int
        lib.mtstore_is_direct.argtypes = [ctypes.c_void_p]
        lib.mtstore_set_threads.argtypes = [ctypes.c_int]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_lib() is not None


def aligned_empty(nbytes: int) -> np.ndarray:
    """uint8 buffer whose data pointer is 4096-aligned (O_DIRECT target)."""
    raw = np.empty(nbytes + ALIGN, dtype=np.uint8)
    off = (-raw.ctypes.data) % ALIGN
    return raw[off : off + nbytes]


class NativeBlobReader:
    """O_DIRECT reader over one blob file with fixed-stride records."""

    def __init__(self, blob_path: str, *, direct: bool = True, threads: int = 4):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native store library unavailable")
        self._lib = lib
        lib.mtstore_set_threads(threads)
        self._h = lib.mtstore_open(blob_path.encode(), 1 if direct else 0)
        if not self._h:
            raise OSError(f"mtstore_open failed for {blob_path}")
        self.is_direct = bool(lib.mtstore_is_direct(self._h))

    def read(self, offset: int, size: int, out: Optional[np.ndarray] = None) -> np.ndarray:
        if out is None:
            out = aligned_empty(size)
        rc = self._lib.mtstore_read(
            self._h, offset, size, out.ctypes.data_as(ctypes.c_void_p)
        )
        if rc != 0:
            raise OSError(f"mtstore_read failed at {offset}+{size}")
        return out

    def read_batch(
        self, requests: Sequence[Tuple[int, int]]
    ) -> List[np.ndarray]:
        """[(offset, size), ...] -> list of buffers, read in parallel."""
        n = len(requests)
        outs = [aligned_empty(sz) for _, sz in requests]
        offs = (ctypes.c_uint64 * n)(*[o for o, _ in requests])
        szs = (ctypes.c_uint64 * n)(*[s for _, s in requests])
        ptrs = (ctypes.c_void_p * n)(
            *[o.ctypes.data_as(ctypes.c_void_p).value for o in outs]
        )
        rc = self._lib.mtstore_read_batch(self._h, n, offs, szs, ptrs)
        if rc != 0:
            raise OSError("mtstore_read_batch failed")
        return outs

    def close(self) -> None:
        if self._h:
            self._lib.mtstore_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
