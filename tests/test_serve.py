"""Serving subsystem: batcher semantics, bucketed service, AOT export,
HTTP endpoint. All on the tiny CPU config (reference has no serving path
— SURVEY.md §2; this is added deployment capability)."""
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dclip_tpu.core.config import CLIPConfig
from dclip_tpu.data.tokenizer import HashTokenizer
from dclip_tpu.models.clip import CLIPModule
from dclip_tpu.serve import (
    ClipService,
    DynamicBatcher,
    export_encoders,
    load_exported,
    pad_to_bucket,
)


@pytest.fixture(scope="module")
def tiny_service():
    cfg = CLIPConfig.tiny_test()
    model = CLIPModule(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.text.max_length), jnp.int32),
        jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)),
    )
    tok = HashTokenizer(vocab_size=cfg.text.vocab_size,
                        max_length=cfg.text.max_length)
    service = ClipService(
        model, variables, cfg, tokenizer=tok, buckets=(1, 2, 4),
        index_dim=cfg.projection_dim,
    )
    return cfg, model, variables, tok, service


# -- DynamicBatcher ----------------------------------------------------------


def test_batcher_merges_concurrent_requests():
    seen_batches = []

    def run(items):
        seen_batches.append(list(items))
        time.sleep(0.01)
        return [i * 10 for i in items]

    with DynamicBatcher(run, max_batch=8, max_wait_s=0.05) as b:
        results = [None] * 6

        def worker(i):
            results[i] = b.submit(i)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert results == [0, 10, 20, 30, 40, 50]
    # All six landed while the worker lingered -> fewer batches than items.
    assert len(seen_batches) < 6
    assert sum(len(x) for x in seen_batches) == 6


def test_batcher_submit_many_order_and_stats():
    with DynamicBatcher(lambda xs: [x + 1 for x in xs], max_batch=4,
                        max_wait_s=0.001) as b:
        out = b.submit_many(list(range(10)))
        assert out == list(range(1, 11))
        s = b.stats()
        assert s["items"] == 10 and s["requests"] == 10
        assert s["batches"] >= 3  # max_batch=4 forces >= ceil(10/4)
        assert s["mean_batch_size"] <= 4


def test_batcher_error_propagates_to_batch_only():
    calls = []

    def run(items):
        calls.append(list(items))
        if -1 in items:
            raise ValueError("poison")
        return items

    with DynamicBatcher(run, max_batch=1, max_wait_s=0.0) as b:
        assert b.submit(5) == 5
        with pytest.raises(ValueError, match="poison"):
            b.submit(-1)
        assert b.submit(7) == 7  # worker survived the failing batch


def test_batcher_close_rejects_new_and_queued():
    b = DynamicBatcher(lambda xs: xs, max_batch=4)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(1)


def test_batcher_result_count_mismatch_is_an_error():
    with DynamicBatcher(lambda xs: xs[:-1] if len(xs) > 1 else xs,
                        max_batch=8, max_wait_s=0.05) as b:
        with pytest.raises(RuntimeError, match="results"):
            b.submit_many([1, 2, 3])


# -- bucketing ---------------------------------------------------------------


def test_pad_to_bucket():
    assert pad_to_bucket(1, (1, 4, 16)) == 1
    assert pad_to_bucket(3, (1, 4, 16)) == 4
    assert pad_to_bucket(16, (1, 4, 16)) == 16
    with pytest.raises(ValueError):
        pad_to_bucket(17, (1, 4, 16))
    with pytest.raises(ValueError):
        pad_to_bucket(0, (1, 4, 16))


# -- ClipService -------------------------------------------------------------


def test_service_text_parity_and_padding_invariance(tiny_service):
    cfg, model, variables, tok, service = tiny_service
    texts = ["a photo of a dog", "two cats", "red car on a street",
             "a", "mountain lake at dawn"]  # n=5 spans chunks 4 + 1
    got = service.encode_texts(texts)
    assert got.shape == (5, cfg.projection_dim)
    ids, mask = tok.encode_batch(texts, max_length=cfg.text.max_length)
    want = model.apply(variables, ids, mask, method=model.get_text_features)
    want = np.asarray(want, np.float32)
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


def test_service_image_parity(tiny_service):
    cfg, model, variables, tok, service = tiny_service
    rng = np.random.RandomState(0)
    images = [rng.randint(0, 255, (40 + 3 * i, 37, 3), np.uint8)
              for i in range(3)]
    got = service.encode_images(images)
    assert got.shape == (3, cfg.projection_dim)

    from PIL import Image

    from dclip_tpu.data.pipeline import preprocess_image

    px = np.stack([
        preprocess_image(Image.fromarray(im), cfg.vision.image_size)
        for im in images
    ]).astype(np.float32)
    want = np.asarray(
        model.apply(variables, px, method=model.get_image_features), np.float32
    )
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_service_search_returns_indexed_neighbor(tiny_service):
    cfg, model, variables, tok, service = tiny_service
    texts = ["a dog", "a cat", "an airplane"]
    embs = service.encode_texts(texts)
    service.add_to_index(["dog", "cat", "plane"], embs)
    hits = service.search(embs, k=2)
    assert [row[0][0] for row in hits] == ["dog", "cat", "plane"]
    assert hits[0][0][1] == pytest.approx(1.0, abs=1e-4)  # self-similarity
    assert service.index_size == 3
    assert service.search(np.zeros((0, cfg.projection_dim)), k=2) == []


def test_search_sees_concurrent_adds(tiny_service):
    """Regression for the search/add race: search() snapshots the packed
    index under the service lock, so a search racing an add can never
    publish a stale pack over the add's invalidation (which would hide
    every later-added entry until the next add)."""
    cfg, model, variables, tok, _ = tiny_service
    svc = ClipService(model, variables, cfg, tokenizer=tok, buckets=(1, 4),
                      index_dim=cfg.projection_dim)
    rng = np.random.RandomState(7)
    vecs = rng.randn(40, cfg.projection_dim).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    errors = []

    def adder():
        try:
            for i in range(40):
                svc.add_to_index([f"v{i}"], vecs[i : i + 1])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def searcher():
        try:
            for _ in range(60):
                if svc.index_size:
                    svc.search(vecs[:2], k=1)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=adder)] + [
        threading.Thread(target=searcher) for _ in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    # Every add must be visible to a post-race search.
    assert svc.index_size == 40
    (hits,) = svc.search(vecs[39:40], k=1)
    assert hits[0][0] == "v39"


def test_service_weights_device_committed(tiny_service):
    """Host-numpy weight trees (hf_import / quantize_clip output) must be
    device_put ONCE at construction — jit re-transfers numpy arguments on
    every call, i.e. a full-weight H2D per request batch."""
    import jax

    cfg, model, variables, tok, _ = tiny_service
    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    for q in (None, "int8"):
        svc = ClipService(model, host_vars, cfg, tokenizer=tok,
                          buckets=(1, 4), quantize=q)
        leaves = jax.tree_util.tree_leaves(svc.variables)
        assert leaves and all(isinstance(x, jax.Array) for x in leaves), q
        svc.encode_texts(["warm"])  # still serves


def test_service_empty_inputs(tiny_service):
    cfg, _, _, _, service = tiny_service
    assert service.encode_texts([]).shape == (0, cfg.projection_dim)
    assert service.encode_images([]).shape == (0, cfg.projection_dim)


# -- AOT export --------------------------------------------------------------


def test_export_roundtrip_parity(tiny_service, tmp_path):
    cfg, model, variables, tok, service = tiny_service
    out = str(tmp_path / "artifact")
    written = export_encoders(
        model, variables, cfg, out, batch_sizes=(1, 4), platforms=("cpu",)
    )
    assert set(written) == {
        "params.npz",
        "text_b1.stablehlo", "text_b4.stablehlo",
        "image_b1.stablehlo", "image_b4.stablehlo",
    }
    loaded = load_exported(out)
    texts = ["a photo of a dog", "two cats", "hello"]
    ids, mask = tok.encode_batch(texts, max_length=cfg.text.max_length)
    got = loaded.encode_texts_ids(ids, mask)
    want = service.encode_texts(texts)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    px = np.zeros((2, cfg.vision.image_size, cfg.vision.image_size, 3),
                  np.float32)
    got_i = loaded.encode_images(px)
    assert got_i.shape == (2, cfg.projection_dim)
    np.testing.assert_allclose(
        np.linalg.norm(got_i, axis=-1), 1.0, atol=1e-5
    )


def test_load_exported_rejects_foreign_dir(tmp_path):
    (tmp_path / "manifest.json").write_text(json.dumps({"format": "nope"}))
    with pytest.raises(ValueError, match="not a dclip export artifact"):
        load_exported(str(tmp_path))


# -- HTTP endpoint -----------------------------------------------------------


def test_http_endpoint_roundtrip(tiny_service):
    from http.server import ThreadingHTTPServer

    from dclip_tpu.cli.serve import make_handler

    cfg, model, variables, tok, service = tiny_service
    handler = make_handler(service, max_batch=8, max_wait_s=0.002)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        def post(route, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{route}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                return json.loads(r.read())

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read()) == {"ok": True}

        # texts distinct from other tests (the module-scoped service's
        # index already holds their embeddings)
        out = post("/v1/embeddings/text",
                   {"texts": ["zebra stripes", "blue whale"]})
        embs = np.asarray(out["embeddings"], np.float32)
        want = service.encode_texts(["zebra stripes", "blue whale"])
        np.testing.assert_allclose(embs, want, rtol=1e-4, atol=1e-4)

        post("/v1/index/add",
             {"ids": ["zebra", "whale"], "embeddings": embs.tolist()})
        hits = post("/v1/search", {"texts": ["zebra stripes"], "k": 1})
        assert hits["results"][0][0]["id"] == "zebra"

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/stats", timeout=30
        ) as r:
            stats = json.loads(r.read())
        assert stats["text_batcher"]["items"] >= 2

        # malformed request -> 400, not a crash
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/embeddings/image",
            data=b'{"nope": 1}',
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()
        srv.server_close()


# -- int8 weight-only quantization (serve.quant) -----------------------------


def test_quantized_forward_cosine_parity(tiny_service):
    """Weight-only int8 embeddings stay directionally faithful to the f32
    forward (cos > 0.99 both modalities) — the quality contract the
    serving docs claim."""
    from dclip_tpu.serve.quant import (
        quantize_clip,
        quantized_image_features,
        quantized_text_features,
    )

    cfg, model, variables, tok, _ = tiny_service
    qp = quantize_clip(variables, cfg)
    rng = np.random.RandomState(0)

    px = jnp.asarray(rng.randn(
        4, cfg.vision.image_size, cfg.vision.image_size, 3
    ).astype(np.float32))
    want = np.asarray(model.apply(variables, px,
                                  method=model.get_image_features))
    got = np.asarray(quantized_image_features(cfg, qp, px))
    cos = (want * got).sum(-1) / (
        np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1)
    )
    assert cos.min() > 0.99, cos

    ids = rng.randint(1, cfg.text.vocab_size - 2,
                      (4, cfg.text.max_length)).astype(np.int32)
    ids[:, -1] = cfg.text.eos_token_id
    mask = np.ones_like(ids)
    want_t = np.asarray(model.apply(
        variables, jnp.asarray(ids), jnp.asarray(mask),
        method=model.get_text_features,
    ))
    got_t = np.asarray(quantized_text_features(
        cfg, qp, jnp.asarray(ids), jnp.asarray(mask)
    ))
    cos_t = (want_t * got_t).sum(-1) / (
        np.linalg.norm(want_t, axis=-1) * np.linalg.norm(got_t, axis=-1)
    )
    assert cos_t.min() > 0.99, cos_t


def test_quantized_service_end_to_end(tiny_service):
    cfg, model, variables, tok, _ = tiny_service
    qsvc = ClipService(
        model, variables, cfg, tokenizer=tok, buckets=(1, 4),
        index_dim=cfg.projection_dim, quantize="int8",
    )
    texts = ["a dog", "a cat", "an airplane"]
    embs = qsvc.encode_texts(texts)
    assert embs.shape == (3, cfg.projection_dim)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=-1), 1.0, atol=1e-5)
    qsvc.add_to_index(["dog", "cat", "plane"], embs)
    hits = qsvc.search_texts(["a cat"], k=1)
    assert hits[0][0][0] == "cat"
    assert qsvc.stats()["quantize"] == "int8"
    with pytest.raises(ValueError, match="quantize"):
        ClipService(model, variables, cfg, quantize="fp4")


def test_quantized_export_smaller_and_faithful(tiny_service, tmp_path):
    cfg, model, variables, tok, service = tiny_service
    fdir, qdir = str(tmp_path / "f32"), str(tmp_path / "int8")
    w_f = export_encoders(model, variables, cfg, fdir,
                          batch_sizes=(4,), platforms=("cpu",))
    w_q = export_encoders(model, variables, cfg, qdir,
                          batch_sizes=(4,), platforms=("cpu",),
                          quantize="int8")
    # int8 shrinks the weight sidecar (the dominant artifact); the
    # StableHLO programs carry no weights, so int8 export must not
    # inflate them (a trace-time constant-fold of the dequant would).
    assert w_q["params.npz"] < 0.45 * w_f["params.npz"], (w_q, w_f)
    assert w_q["image_b4.stablehlo"] < w_f["params.npz"] / 2

    loaded = load_exported(qdir)
    assert loaded.manifest["quantize"] == "int8"
    texts = ["a dog", "two cats"]
    ids, mask = tok.encode_batch(texts, max_length=cfg.text.max_length)
    got = loaded.encode_texts_ids(ids, mask)
    want = service.encode_texts(texts)  # float service, normalized
    cos = (got * want).sum(-1)
    assert cos.min() > 0.99, cos


def test_export_multi_platform_artifact(tiny_service, tmp_path):
    """One artifact lowered for BOTH cpu and tpu loads and runs on cpu
    (the deploy-anywhere story the export docstring promises)."""
    cfg, model, variables, tok, _ = tiny_service
    out = str(tmp_path / "multi")
    export_encoders(model, variables, cfg, out, batch_sizes=(2,),
                    platforms=("cpu", "tpu"), quantize="int8")
    loaded = load_exported(out)
    assert set(loaded.manifest["entries"][0]["platforms"]) == {"cpu", "tpu"}
    ids, mask = tok.encode_batch(["a dog", "a cat"],
                                 max_length=cfg.text.max_length)
    emb = loaded.encode_texts_ids(ids, mask)
    assert emb.shape == (2, cfg.projection_dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-4)


# -- checkpoint -> serving flow ----------------------------------------------


def test_build_service_from_student_checkpoint(tiny_service, tmp_path):
    """cli.serve --student_checkpoint: a distilled-student params file
    changes the served embeddings (the deployment handoff path)."""
    import argparse

    import flax.serialization

    from dclip_tpu.cli.serve import build_service

    cfg, model, variables, tok, _ = tiny_service
    # a "distilled" student: perturb the text projection. NOTE: a uniform
    # additive shift would be invisible — the pooled vector feeding this
    # kernel comes out of final_layer_norm with scale=1/bias=0 here, so
    # its feature-sum is exactly 0 and `kernel + c` cancels; a uniform
    # SCALE would be removed by the L2 normalize. Random noise survives.
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    params["text_projection"]["kernel"] = (
        params["text_projection"]["kernel"]
        + np.random.RandomState(5).randn(
            *params["text_projection"]["kernel"].shape
        ).astype(np.float32)
    )
    ckpt = tmp_path / "student.msgpack"
    ckpt.write_bytes(flax.serialization.msgpack_serialize(
        {"params": params}  # TrainState-file shape (restore handles both)
    ))

    args = argparse.Namespace(
        model_preset="tiny", clip_weights="random", tokenizer_dir="hash",
        seed=0, student_checkpoint=str(ckpt), buckets="1,4",
        index_dim=0, quantize="",
    )
    svc = build_service(args)
    base = ClipService(model, variables, cfg, tokenizer=svc.tokenizer,
                       buckets=(1, 4))
    texts = ["a dog in the park"]
    served = svc.encode_texts(texts)
    original = base.encode_texts(texts)
    assert served.shape == original.shape
    assert not np.allclose(served, original)  # checkpoint actually applied


def test_service_preloaded_index_from_artifact(tiny_service, tmp_path):
    """cli.serve --index_path: a cli.build_index EmbeddingStore artifact
    serves immediately (no POST /v1/index/add bootstrap)."""
    import argparse

    from dclip_tpu.cli.serve import build_service
    from dclip_tpu.data.embedding_store import EmbeddingStore

    cfg, _, _, _, _ = tiny_service
    store = EmbeddingStore(dim=cfg.projection_dim)
    rng = np.random.RandomState(11)
    vecs = rng.randn(5, cfg.projection_dim).astype(np.float32)
    for i, v in enumerate(vecs):
        store.add(f"img_{i}", v)
    path = str(tmp_path / "patch_index.npz")
    store.save(path)

    args = argparse.Namespace(
        model_preset="tiny", clip_weights="random", tokenizer_dir="hash",
        seed=0, student_checkpoint="", buckets="1,4", index_dim=0,
        index_path=path, quantize="",
    )
    svc = build_service(args)
    assert svc.index_size == 5
    # Query with a stored key: top-1 must be its own id (keys are
    # L2-normalized at add; search is inner-product).
    q = vecs[3] / np.linalg.norm(vecs[3])
    (hits,) = svc.search(q[None, :], k=2)
    assert hits[0][0] == "img_3"
    assert hits[0][1] > hits[1][1]


def test_service_rejects_mismatched_preloaded_index(tiny_service):
    from dclip_tpu.data.embedding_store import EmbeddingStore

    cfg, model, variables, tok, _ = tiny_service
    store = EmbeddingStore(dim=cfg.projection_dim + 8)
    store.add("x", np.ones(cfg.projection_dim + 8, np.float32))
    with pytest.raises(ValueError, match="projection"):
        ClipService(model, variables, cfg, tokenizer=tok, buckets=(1,),
                    index=store)


def test_cli_export_dir_writes_loadable_artifact(tmp_path):
    """cli.serve --export_dir: one command emits the AOT artifact."""
    from dclip_tpu.cli.serve import main
    from dclip_tpu.serve.export import load_exported

    out = str(tmp_path / "artifact")
    rc = main([
        "--model_preset", "tiny", "--clip_weights", "random",
        "--tokenizer_dir", "hash", "--buckets", "1,4",
        "--quantize", "int8", "--export_dir", out,
        "--export_platforms", "cpu",
    ])
    assert rc == 0
    loaded = load_exported(out)
    assert loaded.manifest["quantize"] == "int8"
    emb = loaded.encode_texts_ids(
        np.ones((2, loaded.manifest["text_max_length"]), np.int32),
        np.ones((2, loaded.manifest["text_max_length"]), np.int32),
    )
    assert emb.shape == (2, loaded.manifest["projection_dim"])
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-4)


# -- mesh serving --------------------------------------------------------------


def test_mesh_service_parity(tiny_service, cpu_devices):
    """ClipService over a 4-device data mesh: encode outputs and search
    results match the single-device service bit-for-bit (params are
    replicated, the batch shards, outputs gather; index search runs the
    two-stage sharded top-k with pad-row masking)."""
    from jax.sharding import Mesh

    cfg, model, variables, tok, _shared = tiny_service
    # Fresh single-device twin: the module-scoped service's index carries
    # rows from earlier tests.
    single = ClipService(
        model, variables, cfg, tokenizer=tok, buckets=(4, 8),
        index_dim=cfg.projection_dim,
    )
    mesh = Mesh(np.array(cpu_devices[:4]), ("data",))
    svc = ClipService(
        model, variables, cfg, tokenizer=tok, buckets=(4, 8),
        index_dim=cfg.projection_dim, mesh=mesh,
    )
    texts = ["a dog", "two cats on a mat", "red car", "a house",
             "blue bird", "tree", "boat on water"]
    got = svc.encode_texts(texts)
    want = single.encode_texts(texts)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    rng = np.random.RandomState(0)
    size = cfg.vision.image_size
    images = [rng.randint(0, 255, (size, size, 3), np.uint8)
              for _ in range(5)]
    got_i = svc.encode_images(images)
    want_i = single.encode_images(images)
    np.testing.assert_allclose(got_i, want_i, rtol=1e-5, atol=1e-6)

    # Index with a row count that does NOT divide the mesh (pad masking):
    # results must match the single-device search exactly.
    emb = rng.randn(7, cfg.projection_dim).astype(np.float32)
    ids = [f"img{i}" for i in range(7)]
    svc.add_to_index(ids, emb)
    single.add_to_index(ids, emb)
    q = rng.randn(3, cfg.projection_dim).astype(np.float32)
    got_s = svc.search(q, k=3)
    want_s = single.search(q, k=3)
    for g, w in zip(got_s, want_s):
        assert [x[0] for x in g] == [x[0] for x in w]
        np.testing.assert_allclose(
            [x[1] for x in g], [x[1] for x in w], rtol=1e-5
        )


def test_mesh_service_bucket_validation(tiny_service, cpu_devices):
    from jax.sharding import Mesh

    cfg, model, variables, tok, _ = tiny_service
    mesh = Mesh(np.array(cpu_devices[:4]), ("data",))
    with pytest.raises(ValueError, match="divide the mesh"):
        ClipService(model, variables, cfg, tokenizer=tok,
                    buckets=(1, 4), mesh=mesh)
