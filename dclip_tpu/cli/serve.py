"""Local HTTP serving endpoint for DCLIP-TPU embeddings + retrieval.

    python -m dclip_tpu.cli.serve --model_preset vit-b-16 \
        --clip_weights /path/to/hf_snapshot --tokenizer_dir /path/to/tok \
        --port 8900 --index_dim 512

JSON API (stdlib http.server, threaded; concurrent requests are merged
into device batches by serve.DynamicBatcher):

  POST /v1/embeddings/text   {"texts": ["a dog", ...]}
  POST /v1/embeddings/image  {"images_b64": ["<base64 PNG/JPEG>", ...]}
                          or {"paths": ["/abs/img.jpg", ...]}
  POST /v1/index/add         {"ids": [...], "images_b64"/"paths"/"embeddings"}
  POST /v1/search            {"texts": [...], "k": 5}
  GET  /healthz              -> {"ok": true}
  GET  /v1/stats             -> batcher + service counters

The reference has no serving path (eval scripts only); this is the
deployment surface for the distilled student.
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import sys


def build_service(args):
    from dclip_tpu.cli.common import load_clip, load_tokenizer, restore_student_params
    from dclip_tpu.serve import ClipService

    cfg, model, variables = load_clip(
        args.model_preset, args.clip_weights, seed=args.seed,
        compute_dtype="auto", fast_init=True,
    )
    if args.student_checkpoint:
        params = restore_student_params(
            args.student_checkpoint, variables["params"]
        )
        variables = {**variables, "params": params}
    tokenizer = load_tokenizer(
        args.tokenizer_dir, max_length=cfg.text.max_length
    )
    buckets = tuple(int(b) for b in args.buckets.split(","))
    index = None
    if getattr(args, "index_path", ""):
        from dclip_tpu.data.embedding_store import EmbeddingStore

        index = EmbeddingStore.load(args.index_path)
        print(f"loaded index: {len(index)} entries, dim {index.dim}",
              flush=True)
    mesh = None
    if getattr(args, "mesh_data", 1) != 1:
        from dclip_tpu.core.config import MeshConfig
        from dclip_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(MeshConfig(data_parallel=args.mesh_data))
    service = ClipService(
        model, variables, cfg, tokenizer=tokenizer, buckets=buckets,
        index_dim=args.index_dim if args.index_dim > 0 else None,
        quantize=args.quantize or None,
        mesh=mesh,
        index=index,
    )
    return service


def _decode_images(payload):
    import numpy as np
    from PIL import Image

    images = []
    if "images_b64" in payload:
        for s in payload["images_b64"]:
            im = Image.open(io.BytesIO(base64.b64decode(s))).convert("RGB")
            images.append(np.asarray(im, np.uint8))
    elif "paths" in payload:
        for p in payload["paths"]:
            with Image.open(p) as im:
                images.append(np.asarray(im.convert("RGB"), np.uint8))
    else:
        raise ValueError("expected 'images_b64' or 'paths'")
    return images


def make_handler(service, max_batch: int, max_wait_s: float):
    """HTTP handler class closed over the service + request batchers."""
    from http.server import BaseHTTPRequestHandler

    from dclip_tpu.serve import DynamicBatcher

    # One batcher per modality: concurrent HTTP threads enqueue single
    # items; the worker merges them into one bucketed device call.
    text_batcher = DynamicBatcher(
        lambda texts: service.encode_texts(texts),
        max_batch=max_batch, max_wait_s=max_wait_s, name="text",
    )
    image_batcher = DynamicBatcher(
        lambda images: service.encode_images(images),
        max_batch=max_batch, max_wait_s=max_wait_s, name="image",
    )

    class Handler(BaseHTTPRequestHandler):
        batchers = {"text": text_batcher, "image": image_batcher}

        def log_message(self, fmt, *a):  # quiet by default
            pass

        def _send(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            elif self.path == "/v1/stats":
                self._send(200, {
                    "service": service.stats(),
                    "text_batcher": text_batcher.stats(),
                    "image_batcher": image_batcher.stats(),
                })
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):  # noqa: N802
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/v1/embeddings/text":
                    embs = text_batcher.submit_many(payload["texts"])
                    self._send(200, {"embeddings": [e.tolist() for e in embs]})
                elif self.path == "/v1/embeddings/image":
                    embs = image_batcher.submit_many(_decode_images(payload))
                    self._send(200, {"embeddings": [e.tolist() for e in embs]})
                elif self.path == "/v1/index/add":
                    ids = payload["ids"]
                    if "embeddings" in payload:
                        import numpy as np

                        service.add_to_index(
                            ids, np.asarray(payload["embeddings"], np.float32)
                        )
                    else:
                        service.index_images(ids, _decode_images(payload))
                    self._send(200, {"ok": True, "index_size": service.index_size})
                elif self.path == "/v1/search":
                    hits = service.search_texts(
                        payload["texts"], k=int(payload.get("k", 5))
                    )
                    self._send(200, {
                        "results": [
                            [{"id": i, "score": s} for i, s in row]
                            for row in hits
                        ]
                    })
                else:
                    self._send(404, {"error": f"no route {self.path}"})
            except Exception as e:  # noqa: BLE001 — HTTP boundary
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def _selftest(service, args) -> int:
    """One request per endpoint against a live ephemeral-port server."""
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    handler = make_handler(service, args.max_batch, args.max_wait_ms / 1e3)
    srv = ThreadingHTTPServer((args.host, 0), handler)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    def post(route, payload):
        req = urllib.request.Request(
            f"http://{args.host}:{port}{route}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    ok = True
    try:
        with urllib.request.urlopen(
            f"http://{args.host}:{port}/healthz", timeout=300
        ) as r:
            print("healthz:", r.read().decode())
        out = post("/v1/embeddings/text", {"texts": ["a dog", "a red car"]})
        dim = len(out["embeddings"][0])
        print(f"text embeddings: 2 x {dim}")
        ok &= dim == service.cfg.projection_dim
        import numpy as np

        img = np.zeros((48, 64, 3), np.uint8)
        import base64 as b64
        import io as _io

        from PIL import Image

        buf = _io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        out = post("/v1/embeddings/image",
                   {"images_b64": [b64.b64encode(buf.getvalue()).decode()]})
        print(f"image embeddings: 1 x {len(out['embeddings'][0])}")
        if service.index_size == 0 and args.index_dim > 0:
            post("/v1/index/add", {"ids": ["probe"],
                                   "embeddings": out["embeddings"]})
            hits = post("/v1/search", {"texts": ["anything"], "k": 1})
            print("search:", json.dumps(hits))
            ok &= hits["results"][0][0]["id"] == "probe"
        with urllib.request.urlopen(
            f"http://{args.host}:{port}/v1/stats", timeout=300
        ) as r:
            print("stats:", r.read().decode())
    except Exception as e:  # noqa: BLE001 — smoke-check boundary
        print(f"SELFTEST FAILED: {type(e).__name__}: {e}")
        ok = False
    finally:
        srv.shutdown()
        srv.server_close()
    print("SELFTEST", "OK" if ok else "FAILED")
    return 0 if ok else 1


def _bench(service, args) -> int:
    """Concurrent-load measurement of the serving path.

    K client threads each fire single-item requests back-to-back through
    the DynamicBatcher (the HTTP layer is excluded — on this class of
    host it measures Python's http.server, not the TPU serving stack).
    Reported per (modality, concurrency): requests/s, p50/p99 latency,
    mean device batch size the batcher achieved."""
    import threading
    import time

    import numpy as np

    from dclip_tpu.serve import DynamicBatcher

    print("warming up:", json.dumps(service.warmup()), flush=True)
    size = service.cfg.vision.image_size
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (size, size, 3), np.uint8)
    text = "a photo of a dog catching a red frisbee in the park"
    workloads = {
        "text": (lambda b: b.submit(text),
                 lambda: DynamicBatcher(
                     service.encode_texts, max_batch=args.max_batch,
                     max_wait_s=args.max_wait_ms / 1e3, name="text")),
        "image": (lambda b: b.submit(image),
                  lambda: DynamicBatcher(
                      service.encode_images, max_batch=args.max_batch,
                      max_wait_s=args.max_wait_ms / 1e3, name="image")),
    }
    for modality, (fire, make_batcher) in workloads.items():
        for conc in (1, 8, 32):
            per_thread = max(4, 64 // conc)
            with make_batcher() as b:
                fire(b)  # one warm pass through this batcher
                lat: list = []
                lock = threading.Lock()

                def client():
                    mine = []
                    for _ in range(per_thread):
                        t0 = time.perf_counter()
                        fire(b)
                        mine.append(time.perf_counter() - t0)
                    with lock:
                        lat.extend(mine)

                threads = [threading.Thread(target=client)
                           for _ in range(conc)]
                t0 = time.perf_counter()
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
                wall = time.perf_counter() - t0
                s = b.stats()
            lat_ms = sorted(x * 1e3 for x in lat)
            n = len(lat_ms)
            print(json.dumps({
                "modality": modality,
                "concurrency": conc,
                "requests": n,
                "requests_per_sec": round(n / wall, 1),
                "p50_ms": round(lat_ms[n // 2], 1),
                "p99_ms": round(lat_ms[min(n - 1, int(n * 0.99))], 1),
                "mean_batch": round(s["mean_batch_size"], 2),
                "quantize": service.quantize,
            }), flush=True)
    return 0


def _export(args) -> int:
    """--export_dir: lower the encode functions for each bucket and write
    the self-contained artifact (manifest + StableHLO + params.npz)."""
    from dclip_tpu.cli.common import load_clip, restore_student_params
    from dclip_tpu.serve.export import export_encoders

    cfg, model, variables = load_clip(
        args.model_preset, args.clip_weights, seed=args.seed,
        compute_dtype="auto", fast_init=True,
    )
    if args.student_checkpoint:
        params = restore_student_params(
            args.student_checkpoint, variables["params"]
        )
        variables = {**variables, "params": params}
    platforms = (
        tuple(s for s in args.export_platforms.split(",") if s)
        or None
    )
    written = export_encoders(
        model, variables, cfg, args.export_dir,
        batch_sizes=tuple(int(b) for b in args.buckets.split(",")),
        platforms=platforms,
        quantize=args.quantize or None,
    )
    print(json.dumps({"export_dir": args.export_dir, "written": written}),
          flush=True)
    return 0


def main(argv=None) -> int:
    from dclip_tpu.cli.common import add_model_args

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    add_model_args(p)
    p.add_argument("--student_checkpoint", default="",
                   help="optional distilled-student params file")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8900)
    p.add_argument("--buckets", default="1,4,16,64",
                   help="comma-separated serving batch buckets")
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--max_wait_ms", type=float, default=5.0,
                   help="linger for batching once a request is queued")
    p.add_argument("--index_dim", type=int, default=0,
                   help=">0 enables the retrieval index endpoints")
    p.add_argument("--index_path", default="",
                   help="preload a saved EmbeddingStore artifact "
                        "(cli.build_index output) into the retrieval "
                        "index at startup")
    p.add_argument("--mesh_data", type=int, default=1,
                   help="serve over a data-parallel device mesh of this "
                        "size (-1: all devices); encode batches shard "
                        "over it, index search runs the sharded top-k")
    p.add_argument("--quantize", default="", choices=["", "int8"],
                   help="int8: weight-only quantized serving (serve.quant)")
    p.add_argument("--no_warmup", action="store_true")
    p.add_argument("--selftest", action="store_true",
                   help="start on an ephemeral port, run one request per "
                        "endpoint in-process, print the results, and exit "
                        "0/1 (deployment smoke check)")
    p.add_argument("--bench", action="store_true",
                   help="measure the serving path (batcher -> bucketed "
                        "encoder) under concurrent load and exit: one JSON "
                        "line per (modality, concurrency) with throughput "
                        "and latency percentiles")
    p.add_argument("--export_dir", default="",
                   help="write an AOT serving artifact (StableHLO per "
                        "bucket + params.npz, serve.export) to this "
                        "directory and exit — honors --buckets, "
                        "--student_checkpoint and --quantize")
    p.add_argument("--export_platforms", default="",
                   help="comma-separated lowering targets for --export_dir "
                        "(e.g. 'cpu,tpu'; default: current backend)")
    args = p.parse_args(argv)

    if args.export_dir:
        return _export(args)

    service = build_service(args)
    if args.selftest:
        return _selftest(service, args)
    if args.bench:
        return _bench(service, args)
    if not args.no_warmup:
        print("warming up:", json.dumps(service.warmup()), flush=True)
    handler = make_handler(service, args.max_batch, args.max_wait_ms / 1e3)
    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer((args.host, args.port), handler)
    print(f"serving on http://{args.host}:{srv.server_address[1]}", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
