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


# -- native JPEG decode + preprocess (jpeg_decode.cc) --------------------------


def _save_jpeg(path, arr, **kw):
    from PIL import Image

    Image.fromarray(arr).save(str(path), "JPEG", quality=kw.pop("quality", 95),
                              **kw)
    with open(path, "rb") as f:
        return f.read()


@pytest.mark.skipif(not native.jpeg_available(), reason="libjpeg toolchain absent")
def test_jpeg_decode_parity_and_geometry(tmp_path):
    """Native decode+preprocess tracks the PIL path (pipeline.py:74-111)
    within ~1 uint8 LSB across landscape/portrait/odd sizes and grayscale,
    and reports the ORIGINAL frame size (box rescale depends on it)."""
    from PIL import Image

    from dclip_tpu.data.pipeline import preprocess_image, squash_resize
    from dclip_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD

    mean = np.asarray(CLIP_MEAN, np.float32)
    std = np.asarray(CLIP_STD, np.float32)
    rng = np.random.RandomState(0)
    cases = [
        rng.randint(0, 255, (120, 160, 3), np.uint8),   # landscape
        rng.randint(0, 255, (160, 120, 3), np.uint8),   # portrait
        rng.randint(0, 255, (131, 97, 3), np.uint8),    # odd dims
        np.repeat(rng.randint(0, 255, (90, 110, 1), np.uint8), 3, -1),
    ]
    # True grayscale JPEG (1 channel in the file; decoder upconverts).
    gray = rng.randint(0, 255, (100, 80), np.uint8)
    for i, arr in enumerate(cases):
        data = _save_jpeg(tmp_path / f"c{i}.jpg", arr)
        out = native.decode_preprocess(data, 64, 48, mean=mean, std=std)
        assert out is not None
        s, t, (w, h) = out
        assert (w, h) == (arr.shape[1], arr.shape[0])
        assert s.shape == (64, 64, 3) and t.shape == (48, 48, 3)
        with Image.open(tmp_path / f"c{i}.jpg") as im:
            im = im.convert("RGB")
            s_ref = preprocess_image(im, 64)
            t_ref = squash_resize(im, 48)
        # Mean ~1 uint8 LSB in normalized units ((1/255)/std ~ 0.016); max
        # is looser: PIL rounds to uint8 BETWEEN the two resize passes
        # while the native path keeps float32 intermediates, so isolated
        # noise pixels can disagree by several LSB.
        assert np.abs(s - s_ref).mean() < 0.01, f"case {i}"
        assert np.abs(s - s_ref).max() < 0.15, f"case {i}"
        assert np.abs(t - t_ref).mean() < 0.004, f"case {i}"
    data = _save_jpeg(tmp_path / "gray.jpg", gray)
    out = native.decode_preprocess(data, 32, 32, mean=mean, std=std)
    assert out is not None and out[2] == (80, 100)


@pytest.mark.skipif(not native.jpeg_available(), reason="libjpeg toolchain absent")
def test_jpeg_decode_fast_scaled(tmp_path):
    """fast=True (scaled DCT decode, PIL-draft contract) stays close to the
    exact decode and still reports the pre-scale original size."""
    rng = np.random.RandomState(1)
    y, x = np.mgrid[0:400, 0:600]
    arr = np.stack([x * 255 // 600, y * 255 // 400,
                    rng.randint(0, 40, (400, 600))], -1).astype(np.uint8)
    data = _save_jpeg(tmp_path / "big.jpg", arr)
    exact = native.decode_preprocess(data, 64, 48)
    fast = native.decode_preprocess(data, 64, 48, fast=True)
    assert exact is not None and fast is not None
    assert fast[2] == (600, 400)
    assert np.abs(exact[0] - fast[0]).mean() < 0.03  # [0,1] units (no norm)
    assert np.abs(exact[1] - fast[1]).mean() < 0.03


@pytest.mark.skipif(not native.jpeg_available(), reason="libjpeg toolchain absent")
def test_jpeg_decode_rejects_non_jpeg(tmp_path):
    """Anything libjpeg can't fully decode returns None (callers fall back
    to PIL): garbage, PNG bytes, empty, truncated JPEG."""
    from PIL import Image
    import io

    assert native.decode_preprocess(b"", 32, 32) is None
    assert native.decode_preprocess(b"\x00" * 64, 32, 32) is None
    buf = io.BytesIO()
    Image.fromarray(np.zeros((20, 20, 3), np.uint8)).save(buf, "PNG")
    assert native.decode_preprocess(buf.getvalue(), 32, 32) is None
    data = _save_jpeg(tmp_path / "t.jpg",
                      np.zeros((60, 60, 3), np.uint8))
    assert native.decode_preprocess(data[: len(data) // 2], 32, 32) is None
