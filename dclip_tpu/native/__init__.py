"""ctypes bindings for the native host runtime (dclip_native.cc).

Compiled on demand with g++ (no pybind11; plain C ABI). The library is
optional: `available()` gates every use, and all consumers have pure-Python
fallbacks (npz persistence, numpy top-k), so environments without a
toolchain lose speed, not features.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dclip_native.cc")
_LIB_PATH = os.path.join(_HERE, "libdclip_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB_PATH, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        print(f"dclip_native build failed ({e}); using pure-Python fallbacks")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            if not _compile():
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.dcs_open.restype = ctypes.c_void_p
        lib.dcs_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.dcs_count.restype = ctypes.c_int64
        lib.dcs_count.argtypes = [ctypes.c_void_p]
        lib.dcs_put.restype = ctypes.c_int
        lib.dcs_put.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_uint64,
        ]
        lib.dcs_sync.restype = ctypes.c_int
        lib.dcs_sync.argtypes = [ctypes.c_void_p]
        lib.dcs_get.restype = ctypes.c_int64
        lib.dcs_get.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_uint64,
        ]
        lib.dcs_key_at.restype = ctypes.c_int64
        lib.dcs_key_at.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p, ctypes.c_uint64
        ]
        lib.dcs_keys_dump.restype = ctypes.c_int64
        lib.dcs_keys_dump.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64
        ]
        lib.dcs_close.restype = None
        lib.dcs_close.argtypes = [ctypes.c_void_p]
        lib.dcs_topk_ip.restype = None
        lib.dcs_topk_ip.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeKVStore:
    """dict-of-bytes over the mmap'd native store; numpy array helpers.

    The dbm replacement: O(1) open (no pickle parse), single-writer appends,
    `sync()` publishes (the reference syncs its dbm cache every 100 batches,
    train_contrastive_teacher.py:372-374 — same call here).
    """

    def __init__(self, path: str, writable: bool = False):
        lib = _load()
        if lib is None:
            raise RuntimeError("dclip_native unavailable (no g++?)")
        self._lib = lib
        self._h = lib.dcs_open(path.encode(), 1 if writable else 0)
        if not self._h:
            raise OSError(f"cannot open native store {path}")
        self.path = path
        self.writable = writable

    def __len__(self) -> int:
        return int(self._lib.dcs_count(self._h))

    def put(self, key: str, value: bytes) -> None:
        rc = self._lib.dcs_put(self._h, key.encode(), len(key.encode()),
                               value, len(value))
        if rc != 0:
            raise OSError(f"dcs_put failed ({rc})")

    def get(self, key: str) -> Optional[bytes]:
        kb = key.encode()
        n = self._lib.dcs_get(self._h, kb, len(kb), None, 0)
        if n < 0:
            return None
        buf = ctypes.create_string_buffer(int(n))
        self._lib.dcs_get(self._h, kb, len(kb), buf, n)
        return buf.raw

    def __contains__(self, key: str) -> bool:
        kb = key.encode()
        return self._lib.dcs_get(self._h, kb, len(kb), None, 0) >= 0

    def keys(self) -> List[str]:
        """All keys via one bulk native call (O(n); the per-index iterator
        would be O(n^2) across a full enumeration)."""
        size = self._lib.dcs_keys_dump(self._h, None, 0)
        if size <= 0:
            return []
        buf = ctypes.create_string_buffer(int(size))
        self._lib.dcs_keys_dump(self._h, buf, size)
        out = []
        raw = buf.raw
        off = 0
        import struct

        while off + 4 <= size:
            (kl,) = struct.unpack_from("<I", raw, off)
            out.append(raw[off + 4 : off + 4 + kl].decode())
            off += 4 + kl
        return out

    def sync(self) -> None:
        rc = self._lib.dcs_sync(self._h)
        if rc != 0:
            raise OSError(f"dcs_sync failed ({rc})")

    def close(self) -> None:
        if self._h:
            self._lib.dcs_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self.writable and self._h:
            self.sync()
        self.close()

    # -- numpy helpers -----------------------------------------------------------

    def put_array(self, key: str, arr: np.ndarray) -> None:
        import io

        buf = io.BytesIO()
        np.save(buf, arr, allow_pickle=False)
        self.put(key, buf.getvalue())

    def get_array(self, key: str) -> Optional[np.ndarray]:
        import io

        raw = self.get(key)
        if raw is None:
            return None
        return np.load(io.BytesIO(raw), allow_pickle=False)


def topk_ip(
    queries: np.ndarray, store: np.ndarray, k: int, n_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side exact inner-product top-k (FAISS IndexFlatIP contract).

    Falls back to numpy argpartition when the native lib is unavailable.
    """
    queries = np.ascontiguousarray(queries, np.float32)
    store = np.ascontiguousarray(store, np.float32)
    q, d = queries.shape
    n = store.shape[0]
    k = min(k, n)
    lib = _load()
    if lib is None:
        scores = queries @ store.T
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(scores, idx, 1), idx.astype(np.int32)
    out_scores = np.empty((q, k), np.float32)
    out_idx = np.empty((q, k), np.int32)
    lib.dcs_topk_ip(
        queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), q,
        store.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d, k,
        out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    return out_scores, out_idx
