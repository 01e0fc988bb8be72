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
_JPEG_SRC = os.path.join(_HERE, "jpeg_decode.cc")
_JPEG_LIB_PATH = os.path.join(_HERE, "libdclip_jpeg.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_jpeg_lib: Optional[ctypes.CDLL] = None
_jpeg_tried = False


def _build_so(lib_path: str, flags: List[str], what: str) -> bool:
    """Build to a per-process temp path, then atomically rename into
    place. g++ writes its output incrementally, so multiple processes
    (spawned pipeline workers, the two sides of a --multihost run) racing
    an on-demand build against the SAME final path could CDLL a
    half-linked file — or leave a corrupt .so whose fresh mtime suppresses
    every future rebuild. os.replace is atomic on POSIX: the final path
    only ever names a complete library, and concurrent builders just
    overwrite each other with identical results."""
    tmp = f"{lib_path}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", tmp,
           *flags]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, lib_path)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        print(f"{what} build failed ({e}); using fallbacks")
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _compile() -> bool:
    return _build_so(_LIB_PATH, [_SRC, "-lpthread"], "dclip_native")


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


def _load_jpeg() -> Optional[ctypes.CDLL]:
    """The JPEG decode library builds separately (needs -ljpeg) so the
    KV-store/topk library never gains a libjpeg dependency; either can be
    present without the other."""
    global _jpeg_lib, _jpeg_tried
    with _lock:
        if _jpeg_lib is not None or _jpeg_tried:
            return _jpeg_lib
        _jpeg_tried = True
        if not os.path.exists(_JPEG_LIB_PATH) or os.path.getmtime(
            _JPEG_LIB_PATH
        ) < os.path.getmtime(_JPEG_SRC):
            # -march=native is safe here: the .so is built on demand on
            # the machine that runs it (never shipped).
            if not _build_so(
                _JPEG_LIB_PATH,
                ["-march=native", "-funroll-loops", _JPEG_SRC, "-ljpeg"],
                "dclip_jpeg",
            ):
                return None
        try:
            lib = ctypes.CDLL(_JPEG_LIB_PATH)
        except OSError as e:  # e.g. libjpeg runtime missing
            print(f"dclip_jpeg load failed ({e}); PIL decode only")
            return None
        lib.dcj_decode_preprocess.restype = ctypes.c_int
        lib.dcj_decode_preprocess.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
        ]
        _jpeg_lib = lib
        return _jpeg_lib


def jpeg_available() -> bool:
    return _load_jpeg() is not None


def decode_preprocess(
    data: bytes,
    student_size: int,
    teacher_size: int,
    fast: bool = False,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray, Tuple[int, int]]]:
    """Decode a JPEG and produce both pipeline tensors in one native call.

    Returns (student [S,S,3] f32 normalized, teacher [T,T,3] f32 in [0,1],
    (orig_w, orig_h)), or None on any decode failure — callers fall back
    to the PIL path (data/pipeline.py keeps identical semantics there).
    The GIL is released for the duration of the call (ctypes)."""
    lib = _load_jpeg()
    if lib is None:
        return None
    student = np.empty((student_size, student_size, 3), np.float32)
    teacher = np.empty((teacher_size, teacher_size, 3), np.float32)
    wh = (ctypes.c_int * 2)()
    fp = ctypes.POINTER(ctypes.c_float)

    def _fparr(x):
        if x is None:
            return ctypes.cast(None, fp)
        return np.ascontiguousarray(x, np.float32).ctypes.data_as(fp)

    rc = lib.dcj_decode_preprocess(
        data, len(data), student_size, teacher_size, 1 if fast else 0,
        _fparr(mean), _fparr(std),
        student.ctypes.data_as(fp), teacher.ctypes.data_as(fp), wh,
    )
    if rc != 0:
        return None
    return student, teacher, (int(wh[0]), int(wh[1]))


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
