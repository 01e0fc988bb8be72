"""Minimal Flax BERT encoder, numerically matching HF `BertModel`.

The reference loads `BertModel.from_pretrained("bert-base-uncased")` plus a
BERT->CLIP projection head inside its text tokenizer
(/root/reference/training/text_tokenizer.py:27-39). That branch is off the
reference's main distillation path (SURVEY.md §2.1 "loaded but unused"),
but the capability belongs to the component inventory: this module provides
the encoder, the HF weight importer, and `bert_to_clip_features` feeding
`models.projections.TextProjectionModule` — closing the loop the reference
wired but never ran.

Architecture (post-LN BERT): embeddings = word + position + token_type ->
LayerNorm(eps=1e-12); each layer = self-attention -> add&norm ->
GELU-intermediate -> output add&norm; pooler = tanh(dense(CLS)).
Parity vs torch `transformers.BertModel` in tests/test_bert.py.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    max_length: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    @staticmethod
    def base_uncased() -> "BertConfig":
        return BertConfig()

    @staticmethod
    def tiny_test() -> "BertConfig":
        return BertConfig(
            vocab_size=200, hidden_size=32, num_layers=2, num_heads=4,
            mlp_dim=64, max_length=16,
        )


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="query")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="key")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="value")(x)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, c.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * head_dim**-0.5, k,
            preferred_element_type=jnp.float32,
        )
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        b, h, s, d = out.shape
        return out.transpose(0, 2, 1, 3).reshape(b, s, h * d)


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        attn = BertSelfAttention(c, self.dtype, name="attention")(x, mask)
        attn = nn.Dense(c.hidden_size, dtype=self.dtype, name="attention_output")(attn)
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="attention_norm"
        )(x + attn)
        h = nn.Dense(c.mlp_dim, dtype=self.dtype, name="intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)  # BERT uses exact erf GELU
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(h)
        return nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="output_norm"
        )(x + h)


class BertEncoder(nn.Module):
    """HF `BertModel` twin: (last_hidden_state, pooled CLS)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        b, s = input_ids.shape
        tok = nn.Embed(
            c.vocab_size, c.hidden_size, dtype=self.dtype, name="word_embeddings"
        )(input_ids)
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (c.max_length, c.hidden_size),
        ).astype(self.dtype)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        typ = nn.Embed(
            c.type_vocab_size, c.hidden_size, dtype=self.dtype,
            name="token_type_embeddings",
        )(token_type_ids)
        x = tok + pos[None, :s, :] + typ
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="embeddings_norm"
        )(x)

        mask = None
        if attention_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            mask = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
        for i in range(c.num_layers):
            x = BertLayer(c, self.dtype, name=f"layers_{i}")(x, mask)

        pooled = nn.Dense(c.hidden_size, dtype=self.dtype, name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)
        return x, pooled


# ---------------------------------------------------------------------------
# HF weight import.
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_bert_state_dict(
    sd: Mapping[str, Any], cfg: BertConfig
) -> Dict[str, Any]:
    """torch `BertModel.state_dict()` -> BertEncoder flax params. Accepts
    keys with or without the `bert.` prefix."""
    if any(k.startswith("bert.") for k in sd):
        sd = {k[len("bert."):]: v for k, v in sd.items() if k.startswith("bert.")}

    def dense(key):
        return {"kernel": _np(sd[f"{key}.weight"]).T, "bias": _np(sd[f"{key}.bias"])}

    def ln(key):
        return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}

    params: Dict[str, Any] = {
        "word_embeddings": {
            "embedding": _np(sd["embeddings.word_embeddings.weight"])
        },
        "position_embeddings": _np(sd["embeddings.position_embeddings.weight"]),
        "token_type_embeddings": {
            "embedding": _np(sd["embeddings.token_type_embeddings.weight"])
        },
        "embeddings_norm": ln("embeddings.LayerNorm"),
        "pooler": dense("pooler.dense"),
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"
        params[f"layers_{i}"] = {
            "attention": {
                "query": dense(f"{p}.attention.self.query"),
                "key": dense(f"{p}.attention.self.key"),
                "value": dense(f"{p}.attention.self.value"),
            },
            "attention_output": dense(f"{p}.attention.output.dense"),
            "attention_norm": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
            "output_norm": ln(f"{p}.output.LayerNorm"),
        }
    return params


def load_bert_pretrained(path_or_dir: str, cfg: BertConfig) -> Dict[str, Any]:
    """Local HF snapshot dir / .bin / .safetensors -> flax params."""
    import os

    path = path_or_dir
    if os.path.isdir(path):
        for cand in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
        else:
            raise FileNotFoundError(f"No weight file in {path_or_dir}")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_bert_state_dict(sd, cfg)


def bert_to_clip_features(
    bert: BertEncoder,
    bert_params: Any,
    projection_apply,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """BERT pooled output -> CLIP space via TextProjectionModule — the path
    the reference wires at text_tokenizer.py:27-39 (`projection_module`)."""
    _, pooled = bert.apply({"params": bert_params}, input_ids, attention_mask)
    return projection_apply(pooled)
