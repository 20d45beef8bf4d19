"""Native (C++) runtime components, loaded through ctypes.

The reference's hot data path is C (liblmdb's mdb_get walking the B+tree,
dataset/dataset.py:104-149); tpgsr_tpu mirrors that split: the Python
LMDBReader owns format logic (meta parsing, scans, freelist) and delegates
the per-sample point lookup to ``lmdb_reader.cc`` when the shared library
is available.  No pybind11 in this image — a plain C ABI via ctypes.

The .so is built on demand with g++ (one-time, cached next to the source;
falls back to $TMPDIR when the tree is read-only) and the loader degrades
silently to the pure-Python path when no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "lmdb_reader.cc")
_SO_NAME = "liblmdb_native.so"
_lib = None
_lib_tried = False


def _build(so_path: str) -> bool:
    """Compile to a unique temp file then atomically rename: concurrent
    builders (e.g. freshly-spawned DataLoader workers) must never observe a
    half-written .so."""
    tmp = f"{so_path}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, so_path)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def load_native_lmdb() -> Optional[ctypes.CDLL]:
    """The compiled library, building it on first use; None if unavailable."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if os.environ.get("TPGSR_NO_NATIVE"):
        return None
    candidates = [
        os.path.join(os.path.dirname(_SRC), _SO_NAME),
        os.path.join(tempfile.gettempdir(), f"tpgsr_{_SO_NAME}"),
    ]
    for so in candidates:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(_SRC):
            if not _build(so):
                continue
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            continue
        lib.lmdb_native_open.restype = ctypes.c_void_p
        lib.lmdb_native_open.argtypes = [ctypes.c_char_p]
        lib.lmdb_native_get.restype = ctypes.c_longlong
        lib.lmdb_native_get.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.lmdb_native_entries.restype = ctypes.c_ulonglong
        lib.lmdb_native_entries.argtypes = [ctypes.c_void_p]
        lib.lmdb_native_close.restype = None
        lib.lmdb_native_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib
    return None


class NativeLMDB:
    """ctypes wrapper over one opened database (read-only point lookups)."""

    def __init__(self, data_file: str):
        lib = load_native_lmdb()
        if lib is None:
            raise RuntimeError("native lmdb library unavailable")
        self._lib = lib
        self._h = lib.lmdb_native_open(data_file.encode())
        if not self._h:
            raise RuntimeError(f"native open failed: {data_file}")

    def get(self, key: bytes) -> Optional[bytes]:
        out = ctypes.c_void_p()
        n = self._lib.lmdb_native_get(self._h, key, len(key), ctypes.byref(out))
        if n == -1:
            return None
        if n < 0:
            raise RuntimeError(f"native lmdb corrupt structure (rc={n})")
        return ctypes.string_at(out, n)

    def __len__(self) -> int:
        return int(self._lib.lmdb_native_entries(self._h))

    def close(self):
        if self._h:
            self._lib.lmdb_native_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
