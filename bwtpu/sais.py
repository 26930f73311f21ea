"""Suffix-array construction dispatch: C++ SA-IS with NumPy fallback.

Component C3 (SURVEY.md §2.1): the only super-linear step of index
construction upstream. The native path is csrc/sais.cc (O(n) induced
sorting, int64) loaded via ctypes; if the shared library is missing it
is built on first use with `make` when a toolchain exists, else we fall
back to the O(n log^2 n) NumPy prefix-doubling in bwtpu.golden (fine
for bacterial genomes and tests; SA-IS matters at chr21/human scale).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_SO = os.path.join(_CSRC, "build", "libbwtpu.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_tried = False


def _load_native() -> ctypes.CDLL | None:
    global _lib, _lib_tried
    with _lock:
        if _lib is not None or _lib_tried:
            return _lib
        _lib_tried = True
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-C", _CSRC],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception as e:  # no toolchain / build failure -> fallback
                log.warning("SA-IS native build unavailable (%s); using NumPy fallback", e)
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.bwtpu_sais_u8.restype = ctypes.c_int
            lib.bwtpu_sais_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int64,
            ]
            _lib = lib
        except OSError as e:
            log.warning("SA-IS .so load failed (%s); using NumPy fallback", e)
        return _lib


def suffix_array(symbols: np.ndarray, alphabet_size: int = 5,
                 force_fallback: bool = False) -> np.ndarray:
    """Suffix array of `symbols` (uint8, last element the unique 0 sentinel).

    Returns int64 SA. Dispatches to C++ SA-IS when available.
    """
    s = np.ascontiguousarray(symbols, dtype=np.uint8)
    n = len(s)
    if s[-1] != 0 or (n > 1 and np.any(s[:-1] == 0)):
        raise ValueError("input must end with a unique 0 sentinel")
    lib = None if force_fallback else _load_native()
    if lib is not None:
        sa = np.empty(n, dtype=np.int64)
        rc = lib.bwtpu_sais_u8(
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(n),
            ctypes.c_int64(alphabet_size),
        )
        if rc == 0:
            return sa
        log.warning("native SA-IS returned rc=%d; using NumPy fallback", rc)
    from bwtpu.golden import suffix_array as np_sa

    return np_sa(s.astype(np.int64))


def native_available() -> bool:
    return _load_native() is not None
