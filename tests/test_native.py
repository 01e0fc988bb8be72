"""Native C++ runtime: KV store semantics + exact top-k vs numpy."""
import os
import numpy as np
import pytest

from dclip_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ toolchain unavailable"
)


def test_kv_store_roundtrip_and_reopen(tmp_path):
    p = str(tmp_path / "cache.dcs")
    with native.NativeKVStore(p, writable=True) as s:
        s.put("alpha", b"hello")
        s.put("beta", b"\x00\x01\x02" * 100)
        s.put_array("arr", np.arange(12, dtype=np.float32).reshape(3, 4))
        assert s.get("alpha") == b"hello"
        assert "gamma" not in s
        assert len(s) == 3
    # Reopen read-only: mmap path, synced index.
    r = native.NativeKVStore(p)
    assert len(r) == 3
    assert r.get("beta") == b"\x00\x01\x02" * 100
    np.testing.assert_array_equal(
        r.get_array("arr"), np.arange(12, dtype=np.float32).reshape(3, 4)
    )
    assert sorted(r.keys()) == ["alpha", "arr", "beta"]
    r.close()


def test_kv_store_overwrite_last_wins(tmp_path):
    p = str(tmp_path / "ow.dcs")
    with native.NativeKVStore(p, writable=True) as s:
        s.put("k", b"v1")
        s.put("k", b"v2")
        assert s.get("k") == b"v2"
        assert len(s) == 1
    r = native.NativeKVStore(p)
    assert r.get("k") == b"v2"
    r.close()


def test_kv_store_unsynced_tail_ignored(tmp_path):
    """Crash safety: puts after the last sync are invisible on reopen."""
    p = str(tmp_path / "crash.dcs")
    s = native.NativeKVStore(p, writable=True)
    s.put("synced", b"yes")
    s.sync()
    s.put("unsynced", b"no")
    s.close()  # no sync
    r = native.NativeKVStore(p)
    assert r.get("synced") == b"yes"
    assert r.get("unsynced") is None
    r.close()


def test_topk_ip_matches_numpy():
    rng = np.random.RandomState(0)
    q = rng.randn(7, 32).astype(np.float32)
    store = rng.randn(100, 32).astype(np.float32)
    scores, idx = native.topk_ip(q, store, k=5, n_threads=3)
    ref = q @ store.T
    for i in range(7):
        order = np.argsort(-ref[i], kind="stable")[:5]
        np.testing.assert_array_equal(idx[i], order)
        np.testing.assert_allclose(scores[i], ref[i][order], rtol=1e-5)


def test_topk_ip_ties_keep_lowest_index():
    store = np.zeros((6, 4), np.float32)  # all-tied scores
    q = np.ones((1, 4), np.float32)
    _, idx = native.topk_ip(q, store, k=3)
    np.testing.assert_array_equal(idx[0], [0, 1, 2])


def test_topk_k_larger_than_n():
    rng = np.random.RandomState(1)
    q = rng.randn(2, 8).astype(np.float32)
    store = rng.randn(3, 8).astype(np.float32)
    scores, idx = native.topk_ip(q, store, k=10)
    assert scores.shape == (2, 3) and idx.shape == (2, 3)


def test_detection_cache_native_backend(tmp_path):
    from dclip_tpu.data import DetectionCache

    cache = DetectionCache()
    cache.put("a.jpg", np.array([[1, 2, 3, 4]], np.float32), np.array([0.7], np.float32))
    p = str(tmp_path / "det.dcs")
    cache.save(p)
    loaded = DetectionCache.load(p)
    boxes, conf = loaded.get("a.jpg")
    np.testing.assert_allclose(boxes, [[1, 2, 3, 4]])
    np.testing.assert_allclose(conf, [0.7])


def test_embedding_store_native_backend(tmp_path):
    from dclip_tpu.data import EmbeddingStore

    store = EmbeddingStore(dim=8)
    store.add_batch(["x", "y"], np.random.RandomState(0).randn(2, 8))
    p = str(tmp_path / "emb.dcs")
    store.save(p)
    loaded = EmbeddingStore.load(p)
    assert loaded.ids == ["x", "y"]
    np.testing.assert_allclose(loaded.keys, store.keys, atol=1e-7)


def test_kv_store_tsan_build(tmp_path):
    """Race-detection CI hook (SURVEY.md §5): build the native store with
    ThreadSanitizer and exercise concurrent gets against a writer."""
    import subprocess

    src = os.path.join(os.path.dirname(native.__file__), "dclip_native.cc")
    lib = str(tmp_path / "libdclip_tsan.so")
    try:
        subprocess.run(
            ["g++", "-O1", "-std=c++17", "-shared", "-fPIC",
             "-fsanitize=thread", "-o", lib, src, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
    except subprocess.SubprocessError:
        pytest.skip("TSAN toolchain unavailable")
    # Run the threaded access pattern in a subprocess with the TSAN lib so
    # sanitizer reports fail the test via exit code.
    code = f"""
import ctypes, threading
lib = ctypes.CDLL({lib!r})
lib.dcs_open.restype = ctypes.c_void_p
lib.dcs_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
lib.dcs_put.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64,
                        ctypes.c_char_p, ctypes.c_uint64]
lib.dcs_get.restype = ctypes.c_int64
lib.dcs_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64,
                        ctypes.c_char_p, ctypes.c_uint64]
lib.dcs_sync.argtypes = [ctypes.c_void_p]
h = lib.dcs_open({str(tmp_path / 's.dcs').encode()!r}, 1)
def writer():
    for i in range(200):
        k = f"k{{i}}".encode()
        lib.dcs_put(h, k, len(k), b"v" * 64, 64)
    lib.dcs_sync(h)
def reader():
    for i in range(200):
        k = f"k{{i % 50}}".encode()
        lib.dcs_get(h, k, len(k), None, 0)
ts = [threading.Thread(target=writer)] + [threading.Thread(target=reader)]
[t.start() for t in ts]; [t.join() for t in ts]
print("TSAN RUN DONE")
"""
    import glob
    import sys

    # libtsan must be preloaded: dlopen-ing a TSAN-built .so into a normal
    # process fails with "cannot allocate memory in static TLS block".
    tsan_libs = glob.glob("/lib/x86_64-linux-gnu/libtsan.so*") + glob.glob(
        "/usr/lib/x86_64-linux-gnu/libtsan.so*"
    )
    if not tsan_libs:
        pytest.skip("libtsan runtime not found")
    env = dict(os.environ, LD_PRELOAD=tsan_libs[0])
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       timeout=120, text=True, env=env)
    assert "TSAN RUN DONE" in r.stdout, r.stderr[-2000:]
    assert "WARNING: ThreadSanitizer" not in r.stderr, r.stderr[-2000:]
