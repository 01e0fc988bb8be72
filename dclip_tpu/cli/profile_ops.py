"""Per-op speed-of-light decomposition of the cache-warm student step.

The cache-warm distillation step (epochs >= 1: student fwd/bwd + optimizer,
teacher served from the target cache) is the framework's steady-state cost,
and its model-FLOPs MFU has plateaued around 0.65 on v5e (BENCH_r04). This
module answers, with on-chip measurements, WHERE the remaining (1 - MFU)
goes: each op (or op cycle) of one vision encoder layer (the step's FLOP
budget), the packed text stack, and the loss epilogue is timed at the exact
step shapes and compared against its analytic floor —

  GEMM floor       2*M*N*K / peak MXU FLOP/s (bf16)
  HBM floor        unavoidable bytes in+out / peak HBM bandwidth
  floor            max(GEMM, HBM): compute and DMA overlap on TPU

Ops whose measured time sits ON their floor are done — no kernel can beat
the hardware. The step's ceiling is then sum(per-op floors), and the
*achievable* ceiling substitutes each Pallas attention kernel's MEASURED
time for its floor where the excess is VPU work the MXU/HBM floors don't
model (the [S, S] f32 softmax chain is ALU-bound on the VPU — see
kernels/vit_attention's phase-split notes; its GEMMs are ~5% of the op).

Timing methodology — in-jit cycles, differenced. `jax.block_until_ready`
does NOT block on this environment's tunneled TPU backend (measured
0.04 ms for a 0.9 ms-floor GEMM: only dispatch was timed), and a per-call
scalar fetch charges the tunnel's ~26 ms D2H latency to every call. So
each op is unrolled as a k-iteration cycle inside ONE jit, feeding the
op's output back into its input (data dependence defeats dead-code
elimination and CSE across iterations), and timed as
(t[k_hi] - t[k_lo]) / (k_hi - k_lo) — the difference cancels dispatch,
fetch, and any constant tunnel overhead. Feedback casts/underflow after many iterations
are harmless: op cost depends on shapes/dtypes, not values.

Caveats (also printed): isolated cycles lose XLA's cross-op fusion and
overlap, so sums of op rows modestly overstate a real fused step — the
`vit layer fwd+bwd` row, which runs one REAL layer's forward + masked
backward per iteration (same kernels, same trainable set as the warm
step), is the composite that includes those effects; floors are per-op
lower bounds for THIS op sequence, not for a differently-fused one (a
kernel that never materializes an intermediate removes its HBM floor —
exactly what the fused attention/MLP kernels already do).

Reference frame: the student hot loop this decomposes is
/root/reference/training/CLIP_image_distillation.py:580-634 (student
forward/backward + optimizer); the reference has no profiling subsystem
(SURVEY.md §5), so both the tool and the ceiling analysis are new
capability.

Usage: python -m dclip_tpu.cli.profile --per_op [--batch N] [--json]
"""
from __future__ import annotations

import time

# v5e public specs: 197 TFLOP/s bf16 MXU peak, 819 GB/s HBM bandwidth.
PEAK_BF16 = 197e12
HBM_GBPS = 819e9

K_LO, K_HI = 4, 24


def _cycle_ms(make_loop, operands, warmup: int = 1, k_lo: int = K_LO,
              k_hi: int = K_HI) -> float:
    """ms per iteration of the cycle, by differencing two iteration counts
    inside single jits (see module docstring: block_until_ready is broken
    on the tunneled backend, so only in-jit repetition measures cleanly).
    Cycles UNROLL k python-loop iterations (static k per jit) rather than
    using lax.fori_loop: the loop carry's buffer constraints pushed one
    Pallas kernel over the scoped-VMEM stack limit, and data-dependent
    feedback already prevents XLA from CSE-merging the unrolled bodies."""
    import functools

    import jax

    def timed(k):
        fn = jax.jit(functools.partial(make_loop, k))
        for _ in range(warmup):
            out = fn(*operands)
        # the scalar fetch is the only real synchronization available
        float(out)
        t0 = time.perf_counter()
        out = fn(*operands)
        float(out)
        return time.perf_counter() - t0

    t_lo = timed(k_lo)
    t_hi = timed(k_hi)
    return max(t_hi - t_lo, 0.0) / (k_hi - k_lo) * 1e3


def run_per_op(batch: int, steps: int, as_json: bool) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dclip_tpu.core.config import CLIPConfig

    del steps  # iteration counts are fixed by the differencing scheme

    cfg = CLIPConfig.vit_b_16()
    v = cfg.vision
    B = batch
    S = (v.image_size // v.patch_size) ** 2 + 1  # 197
    D = v.hidden_size                            # 768
    H = v.num_heads                              # 12
    MLP = v.mlp_dim                              # 3072
    M = B * S
    bf = jnp.bfloat16
    ITEM = 2  # bf16 bytes

    from dclip_tpu.core.platform import is_tpu_platform

    interp = not is_tpu_platform(jax.default_backend())
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)

    def dput(*shape, dtype=None, scale=0.02):
        arr = (rng.standard_normal(shape) * scale).astype(np.float32)
        out = jax.device_put(arr, dev)
        return out if dtype is None else out.astype(dtype)

    # Operands at the exact warm-step shapes. Weights f32 (the param
    # tree's storage dtype); ops cast to bf16 in-jit like the modules do,
    # so each cycle pays the same per-step cast the real step does.
    x0 = dput(B, S, D, dtype=bf)
    g0 = dput(B, S, D, dtype=bf)
    ln_s = dput(D, scale=1.0)
    ln_b = dput(D)
    # Separate q/k/v projections, like the real module (models/clip.py
    # _AttnParams) — three [D, D] GEMMs, not one [D, 3D].
    wq, bq = dput(D, D), dput(D)
    wk, bk = dput(D, D), dput(D)
    wv, bv = dput(D, D), dput(D)
    wo, bo = dput(D, D), dput(D)
    w1, b1 = dput(D, MLP), dput(MLP)
    w2, b2 = dput(MLP, D), dput(D)

    from dclip_tpu.kernels.mlp_frozen import mlp_block_frozen
    from dclip_tpu.kernels.vit_attention import (
        _self_attention_bwd_stats,
        _self_attention_fwd_stats,
        self_attention_trainable,
    )

    def ln(x, s, b):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * s + b).astype(bf)

    gemm = lambda f: f / PEAK_BF16 * 1e3       # noqa: E731  ms
    hbm = lambda by: by / HBM_GBPS * 1e3       # noqa: E731  ms

    rows = []  # (name, measured_ms, gemm_floor_ms, hbm_floor_ms, bound)

    def add(name, measured, gemm_flops, bytes_moved, kind):
        rows.append(
            (name, measured, gemm(gemm_flops), hbm(bytes_moved), kind)
        )
        return measured

    # ---- ln1 fwd cycle: x <- ln(x) -------------------------------------
    def ln_loop(k, x):
        for _ in range(k):
            x = ln(x, ln_s, ln_b)
        return jnp.sum(x.astype(jnp.float32))

    add("ln_fwd", _cycle_ms(ln_loop, (x0,)), 0.0, 2 * M * D * ITEM, "HBM")

    # ---- ln fwd+bwd cycle: g <- vjp(g) ---------------------------------
    def ln_bwd_loop(k, x, g):
        # x advances too — with a fixed x the forward is loop-invariant
        # and XLA hoists it, leaving only the backward in the cycle.
        for _ in range(k):
            _, vjp = jax.vjp(lambda t: ln(t, ln_s, ln_b), x)
            x = vjp(g)[0]
        return jnp.sum(x.astype(jnp.float32))

    add("ln fwd+bwd (vjp)", _cycle_ms(ln_bwd_loop, (x0, g0)), 0.0,
        5 * M * D * ITEM, "HBM")

    # ---- qkv projections fwd+dx cycle: h -> q,k,v -> dh ----------------
    # One iteration runs BOTH directions of the projection GEMMs (three
    # [M,D]x[D,D] forward + the transposed dx GEMMs) — the natural
    # self-feeding cycle (output shape == input shape).
    def proj_cycle(k, h):
        wqb, wkb, wvb = (w.astype(bf) for w in (wq, wk, wv))
        for _ in range(k):
            hm = h.reshape(M, D)
            q = hm @ wqb + bq.astype(bf)
            kk = hm @ wkb + bk.astype(bf)
            vvv = hm @ wvb + bv.astype(bf)
            h = (q @ wqb.T + kk @ wkb.T + vvv @ wvb.T).reshape(B, S, D)
        return jnp.sum(h.astype(jnp.float32))

    add("qkv proj fwd + dx (6 GEMMs)", _cycle_ms(proj_cycle, (x0,)),
        6 * 2.0 * M * D * D, 8 * M * D * ITEM + 2 * 3 * D * D * 4, "MXU")

    # ---- out-projection fwd+dx cycle -----------------------------------
    def outproj_cycle(k, o):
        wob = wo.astype(bf)
        for _ in range(k):
            y = o.reshape(M, D) @ wob + bo.astype(bf)
            o = (y @ wob.T).reshape(B, S, D)
        return jnp.sum(o.astype(jnp.float32))

    add("out proj fwd + dx (2 GEMMs)", _cycle_ms(outproj_cycle, (x0,)),
        2 * 2.0 * M * D * D, 4 * M * D * ITEM + 2 * D * D * 4, "MXU")

    # ---- attention dW cycle --------------------------------------------
    # dW = h^T dy for the four projections: four [D,M]x[M,D] GEMMs over
    # DISTINCT operand pairs (identical pairs would CSE into one GEMM).
    # The weight-shaped outputs feed the next iteration through a scalar
    # perturbation of h — that extra [M,D] pass is charged to the floor.
    extra = dput(B, S, D, dtype=bf)
    extra2 = dput(B, S, D, dtype=bf)

    def dw_cycle(k, h, dy, o, g):
        acc = 0.0
        for _ in range(k):
            pairs = [(h, dy), (o, g), (h, g), (o, dy)]
            dws = [
                jax.lax.dot_general(
                    a.reshape(M, D), b_.reshape(M, D),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for a, b_ in pairs
            ]
            # consume every dW nonlinearly (a plain sum-of-dot can be
            # algebraically factored into dots of sums; |.| cannot), and
            # feed back through a PERMUTATION — a scalar-scale feedback
            # h' = c*h lets XLA rewrite dot(h', dy) = c*dot(h, dy) and
            # CSE every iteration down to one GEMM (measured: "4 GEMMs"
            # at half their floor). roll() defeats the algebra; its
            # [M, D] copy (~0.19 ms) is charged to the floor below.
            acc = acc + sum(jnp.sum(jnp.abs(dw)) for dw in dws)
            h = jnp.roll(h, 1, axis=0)
        return jnp.sum(h.astype(jnp.float32)) + acc

    add("attn dW (4 GEMMs)", _cycle_ms(dw_cycle, (x0, g0, extra, extra2)),
        4 * 2.0 * M * D * D,
        8 * M * D * ITEM + 4 * D * D * 4, "MXU")

    # ---- fused attention kernels ---------------------------------------
    def attn_fwd_cycle(k, q, kk, vvv):
        for _ in range(k):
            q, m, r = _self_attention_fwd_stats(q, kk, vvv, num_heads=H,
                                                interpret=interp)
        return jnp.sum(q.astype(jnp.float32))

    attn_fwd_ms = add(
        "attn fwd kernel (Pallas)", _cycle_ms(attn_fwd_cycle, (x0, x0, g0)),
        2 * 2.0 * B * S * S * D, 4 * B * S * D * ITEM + 2 * B * S * H * 4,
        "VPU",
    )

    o0, m0, r0 = _self_attention_fwd_stats(x0, x0, g0, num_heads=H, interpret=interp)

    def attn_bwd_cycle(k, q, kk, vvv, g, o, m, r):
        for _ in range(k):
            q, kk, vvv = _self_attention_bwd_stats(
                q, kk, vvv, g, o, m, r, num_heads=H, interpret=interp)
        return jnp.sum(q.astype(jnp.float32))

    attn_bwd_ms = add(
        "attn bwd kernel (Pallas)",
        _cycle_ms(attn_bwd_cycle, (x0, x0, g0, g0, o0, m0, r0)),
        5 * 2.0 * B * S * S * D, 8 * B * S * D * ITEM + 2 * B * S * H * 4,
        "VPU",
    )

    # ---- fused frozen LN2+MLP pair -------------------------------------
    def mlp_fwd_cycle(k, x):
        for _ in range(k):
            x = mlp_block_frozen(x, ln_s, ln_b, w1, b1, w2, b2,
                                 interpret=interp)
        return jnp.sum(x.astype(jnp.float32))

    add("ln2+mlp fwd (Pallas frozen pair)", _cycle_ms(mlp_fwd_cycle, (x0,)),
        2.0 * M * D * MLP * 2,
        (2 * M * D + M * MLP) * ITEM + (D * MLP * 2) * 4, "MXU")

    def mlp_bwd_cycle(k, x, g):
        # x advances too (see ln_bwd_loop): dx feeds the next forward, so
        # each iteration really runs fwd(save) + dx.
        for _ in range(k):
            _, vjp = jax.vjp(
                lambda t: mlp_block_frozen(t, ln_s, ln_b, w1, b1, w2, b2,
                                           interpret=interp), x
            )
            x = vjp(g)[0].astype(bf)
        return jnp.sum(x.astype(jnp.float32))

    add("ln2+mlp fwd+dx (Pallas pair)", _cycle_ms(mlp_bwd_cycle, (x0, g0)),
        2.0 * M * D * MLP * 4,
        (4 * M * D + 2 * M * MLP) * ITEM + 2 * (D * MLP * 2) * 4, "MXU")

    # ---- composite: one REAL vision layer, fwd + masked bwd ------------
    # Same kernels and trainable set as the warm step's vision tower
    # (attention projections trainable; LN/MLP frozen -> dW only for the
    # four projections, frozen-MLP pair emits zero weight cotangents).
    def layer_fn(x, wq, bq, wk, bk, wv, bv, wo, bo):
        h = ln(x, ln_s, ln_b)
        hm = h.reshape(M, D)
        q = (hm @ wq.astype(bf) + bq.astype(bf)).reshape(B, S, D)
        kk = (hm @ wk.astype(bf) + bk.astype(bf)).reshape(B, S, D)
        vvv = (hm @ wv.astype(bf) + bv.astype(bf)).reshape(B, S, D)
        o = self_attention_trainable(q, kk, vvv, num_heads=H, interpret=interp)
        x = x + (
            o.reshape(M, D) @ wo.astype(bf) + bo.astype(bf)
        ).reshape(B, S, D)
        return mlp_block_frozen(x, ln_s, ln_b, w1, b1, w2, b2, interpret=interp)

    def layer_cycle(k, x, g):
        # Weight cotangents are folded into the output scalar — dropping
        # them would let XLA dead-code-eliminate the dW GEMMs the real
        # masked backward runs.
        acc = 0.0
        for _ in range(k):
            grads = jax.vjp(layer_fn, x, wq, bq, wk, bk, wv, bv, wo, bo)[1](g)
            x = grads[0].astype(bf)
            acc = acc + sum(
                jnp.sum(jnp.abs(t.astype(jnp.float32))) for t in grads[1:]
            )
        return jnp.sum(x.astype(jnp.float32)) + acc

    layer_gemm = (
        6 * 2.0 * M * D * D          # q/k/v fwd + dx
        + 2 * 2.0 * M * D * D        # out proj fwd + dx
        + 4 * 2.0 * M * D * D        # four dW
        + 7 * 2.0 * B * S * S * D    # attn kernel fwd (2) + bwd (5)
        + 2.0 * M * D * MLP * 4      # mlp fwd(save) + dx (custom VJP)
    )
    layer_bytes = (  # dominant [B,S,D]-sized streams + the a1 saves
        (7 + 4 + 2 + 12) * M * D * ITEM + 3 * M * MLP * ITEM
    )
    layer_ms = add(
        "vit layer fwd+bwd (REAL composite)",
        _cycle_ms(layer_cycle, (x0, g0), warmup=1, k_lo=2, k_hi=8),
        layer_gemm, layer_bytes, "mixed",
    )

    # ---- text stack (packed) fwd+bwd -----------------------------------
    from dclip_tpu.cli.common import (
        host_random_variables,
        synthetic_distill_batch,
    )
    from dclip_tpu.core.config import TeacherConfig
    from dclip_tpu.core.flops import text_forward_flops
    from dclip_tpu.models.clip import CLIPModule
    from dclip_tpu.ops.packing import pack_captions

    tcfg = TeacherConfig(embed_dim=cfg.projection_dim, num_heads=8,
                         max_patches=8, max_text_tokens=cfg.text.max_length)
    hb = synthetic_distill_batch(cfg, tcfg, B)
    packed = pack_captions(hb["input_ids"], hb["attention_mask"],
                           cfg.text.eos_token_id)
    R = packed["packed_ids"].shape[0]

    clip = CLIPModule(cfg, dtype=bf, fused_attention=True,
                      pallas_interpret=interp)
    variables = host_random_variables(
        clip,
        lambda: clip.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.text.max_length), jnp.int32),
            jnp.zeros((1, v.image_size, v.image_size, 3)),
        ),
    )
    params = jax.device_put(variables["params"], dev)
    text_keys = ("text_model", "text_projection")
    textp = {kk: params[kk] for kk in text_keys}
    rest = {kk: t for kk, t in params.items() if kk not in text_keys}
    pk = tuple(
        jax.device_put(np.asarray(packed[kk]), dev)
        for kk in ("packed_ids", "packed_segments", "packed_positions",
                   "packed_eos_rows", "packed_eos_cols")
    )

    def text_cycle(k, textp):
        def loss_fn(tp):
            f = clip.apply(
                {"params": {**rest, **tp}}, *pk,
                method=CLIPModule.get_packed_text_features,
            )
            return jnp.sum(f.astype(jnp.float32) ** 2)

        for _ in range(k):
            grads = jax.grad(loss_fn)(textp)
            # SGD-style feedback makes iterations data-dependent; the
            # update pass is ~150 MB f32 (~0.4 ms), charged to the floor.
            textp = jax.tree.map(lambda p, g: p - 1e-12 * g, textp, grads)
        return jnp.sum(textp["text_projection"]["kernel"])

    n_text_params = sum(
        t.size for t in jax.tree.leaves(textp)
    )
    text_ms = add(
        f"text stack fwd+bwd (packed, R={R})",
        _cycle_ms(text_cycle, (textp,), k_lo=2, k_hi=8),
        3.0 * text_forward_flops(cfg) * R, 3 * n_text_params * 4, "MXU",
    )

    # ---- loss epilogue --------------------------------------------------
    emb_i = dput(B, cfg.projection_dim)
    emb_t = dput(B, cfg.projection_dim)

    def loss_cycle(k, ei, et):
        def loss_fn(ei):
            a = ei / jnp.linalg.norm(ei, axis=-1, keepdims=True)
            b = et / jnp.linalg.norm(et, axis=-1, keepdims=True)
            lg = 100.0 * a @ b.T
            labels = jnp.arange(B)
            li = -jax.nn.log_softmax(lg, axis=-1)[labels, labels].mean()
            lt = -jax.nn.log_softmax(lg.T, axis=-1)[labels, labels].mean()
            return 0.5 * (li + lt)

        for _ in range(k):
            ei = ei - 1e-6 * jax.grad(loss_fn)(ei)
        return jnp.sum(ei)

    loss_ms = add(
        "loss tail (contrastive, [B,proj])",
        _cycle_ms(loss_cycle, (emb_i, emb_t)),
        3 * 2.0 * B * B * cfg.projection_dim,
        6 * B * cfg.projection_dim * 4, "MXU",
    )

    # ---- report ---------------------------------------------------------
    L = v.num_layers
    # Sum-of-parts per layer (for cross-checking the composite row): the
    # fwd+bwd cycles cover one forward + one backward each — ln fwd+bwd
    # (row 1), qkv proj (2), out proj (3), dW (4), attn kernels (5, 6),
    # mlp fwd(save)+dx (8). Rows 0 and 7 (standalone forwards) are
    # informational, not part of the layer sum.
    parts = [rows[i] for i in (1, 2, 3, 4, 5, 6, 8)]
    part_sum = sum(r[1] for r in parts)
    floor_layer = sum(max(r[2], r[3]) for r in parts)
    attn_fwd_floor = max(rows[5][2], rows[5][3])
    attn_bwd_floor = max(rows[6][2], rows[6][3])
    ach_layer = floor_layer + (
        attn_fwd_ms - attn_fwd_floor + attn_bwd_ms - attn_bwd_floor
    )
    tail_ms = text_ms + loss_ms
    tail_floor = sum(max(r[2], r[3]) for r in rows[10:])
    step_meas = L * layer_ms + tail_ms
    step_floor = L * floor_layer + tail_floor
    step_ach = L * ach_layer + tail_floor

    from dclip_tpu.core.flops import distill_step_flops

    true_flops = distill_step_flops(
        cfg, cfg, tcfg, B, teacher_cached=True, reference_mask=True,
        text_rows_fraction=R / B,
    )
    mfu_of = lambda ms: true_flops / (ms * 1e-3) / PEAK_BF16  # noqa: E731

    out = {
        "batch": B, "seq": S, "hidden": D, "packed_rows": R,
        "rows": [
            {"op": n, "measured_ms": round(dt, 3),
             "gemm_floor_ms": round(gf, 3), "hbm_floor_ms": round(hf, 3),
             "floor_ms": round(max(gf, hf), 3),
             "x_over_floor": round(dt / max(gf, hf), 2)
             if max(gf, hf) > 0 else None, "bound": kind}
            for n, dt, gf, hf, kind in rows
        ],
        "per_layer_composite_ms": round(layer_ms, 2),
        "per_layer_sum_of_parts_ms": round(part_sum, 2),
        "per_layer_floor_ms": round(floor_layer, 2),
        "per_layer_achievable_ms": round(ach_layer, 2),
        "step_measured_ms": round(step_meas, 1),
        "step_floor_ms": round(step_floor, 1),
        "step_achievable_ms": round(step_ach, 1),
        "mfu_true_at_measured": round(mfu_of(step_meas), 4),
        "mfu_true_at_floor": round(mfu_of(step_floor), 4),
        "mfu_true_at_achievable": round(mfu_of(step_ach), 4),
    }
    if as_json:
        import json

        print(json.dumps(out))
        return 0

    print(f"== per-op speed-of-light decomposition: cache-warm student step "
          f"==\n   B={B} S={S} D={D} H={H} MLP={MLP} bf16, v5e peaks "
          f"{PEAK_BF16/1e12:.0f} TF/s MXU, {HBM_GBPS/1e9:.0f} GB/s HBM\n"
          f"   in-jit cycle timing, (t[K={K_HI}]-t[K={K_LO}])/{K_HI-K_LO} "
          f"per row")
    print(f"{'op':<38}{'meas ms':>9}{'GEMM fl':>9}{'HBM fl':>9}"
          f"{'x/floor':>9}  bound")
    for n, dt, gf, hf, kind in rows:
        fl = max(gf, hf)
        ratio = f"{dt / fl:.2f}" if fl > 0 else "-"
        print(f"{n:<38}{dt:>9.3f}{gf:>9.3f}{hf:>9.3f}{ratio:>9}  {kind}")
    print(f"\nper-layer: composite {layer_ms:.2f} ms | sum-of-parts "
          f"{part_sum:.2f} | floor {floor_layer:.2f} | achievable "
          f"(XLA at floor, Pallas softmax at measured) {ach_layer:.2f}")
    print(f"step (12 layers + text + loss): measured {step_meas:.1f} ms "
          f"-> true MFU {out['mfu_true_at_measured']:.3f}")
    print(f"  at floors:     {step_floor:.1f} ms -> true MFU "
          f"{out['mfu_true_at_floor']:.3f}")
    print(f"  achievable:    {step_ach:.1f} ms -> true MFU "
          f"{out['mfu_true_at_achievable']:.3f}")
    print("\nnote: sum-of-parts overstates the composite (no cross-op "
          "overlap/fusion between\nisolated cycles); floors assume perfect "
          "MXU/HBM overlap — see module docstring.")
    return 0
