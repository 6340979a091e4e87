"""BERT-large text encoder (text-mode path only), TPU-native.

Rebuild of the reference's vendored xbert BERT used by InternVideo2's text
side (reference: models/backbones/bert/xbert.py, 2,170 LoC — of which GenRL
exercises only `mode="text"`: embeddings + 24 post-LN self-attention layers;
demo/small_utils.py:205-226). Cross-attention fusion layers exist in the
checkpoint but are unused in text mode and skipped by the converter.

BERT-large: vocab 30522, hidden 1024, 24 layers, 16 heads, intermediate
4096, LayerNorm eps 1e-12, learned position embeddings, gelu.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BertLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        B, L, C = x.shape
        H = self.heads
        D = C // H
        dense = lambda n, feats=C: nn.Dense(feats, dtype=self.dtype,
                                            param_dtype=jnp.float32, name=n)
        q = dense("query")(x).reshape(B, L, H, D).transpose(0, 2, 1, 3)
        k = dense("key")(x).reshape(B, L, H, D).transpose(0, 2, 1, 3)
        v = dense("value")(x).reshape(B, L, H, D).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) / np.sqrt(D)
        scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))
        ctx = ctx.astype(self.dtype).transpose(0, 2, 1, 3).reshape(B, L, C)
        attn_out = dense("attn_out")(ctx)
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, param_dtype=jnp.float32,
                         name="attn_ln")(x + attn_out)
        h = dense("intermediate", self.intermediate)(x)
        h = nn.gelu(h, approximate=False)
        h = dense("output")(h)
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, param_dtype=jnp.float32,
                         name="out_ln")(x + h)
        return x


class BertEncoder(nn.Module):
    vocab_size: int = 30522
    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    intermediate: int = 4096
    max_position: int = 512
    type_vocab: int = 2
    eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        """input_ids [B, L] int32, attention_mask [B, L] (1 = keep) ->
        last hidden state [B, L, hidden] (f32)."""
        B, L = input_ids.shape
        word = nn.Embed(self.vocab_size, self.hidden, param_dtype=jnp.float32,
                        name="word_embeddings")(input_ids)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (self.max_position, self.hidden), jnp.float32)
        tok = self.param("token_type_embeddings", nn.initializers.normal(0.02),
                         (self.type_vocab, self.hidden), jnp.float32)
        x = word + pos[None, :L] + tok[0][None, None]
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, param_dtype=jnp.float32,
                         name="embeddings_ln")(x.astype(self.dtype))
        bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9
        for i in range(self.layers):
            x = BertLayer(self.hidden, self.heads, self.intermediate, self.eps,
                          dtype=self.dtype, name=f"layer_{i}")(x, bias)
        return x.astype(jnp.float32)


def convert_bert_state_dict(sd: Dict[str, np.ndarray], prefix: str = "bert.") -> Dict[str, Any]:
    """HF/xbert-style BERT state_dict -> BertEncoder param subtree.
    Cross-attention ('crossattention') weights of fusion layers are skipped —
    unused in text mode."""
    p: Dict[str, Any] = {}

    def put(path, value):
        node = p
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(np.asarray(value))

    emb = f"{prefix}embeddings."
    put("word_embeddings/embedding", sd[f"{emb}word_embeddings.weight"])
    put("position_embeddings", sd[f"{emb}position_embeddings.weight"])
    put("token_type_embeddings", sd[f"{emb}token_type_embeddings.weight"])
    put("embeddings_ln/scale", sd[f"{emb}LayerNorm.weight"])
    put("embeddings_ln/bias", sd[f"{emb}LayerNorm.bias"])

    import re

    n_layers = 0
    for k in sd:
        m = re.match(rf"{re.escape(prefix)}encoder\.layer\.(\d+)\.", k)
        if m:
            n_layers = max(n_layers, int(m.group(1)) + 1)
    for i in range(n_layers):
        s = f"{prefix}encoder.layer.{i}"
        d = f"layer_{i}"
        pairs = [
            (f"{s}.attention.self.query", f"{d}/query"),
            (f"{s}.attention.self.key", f"{d}/key"),
            (f"{s}.attention.self.value", f"{d}/value"),
            (f"{s}.attention.output.dense", f"{d}/attn_out"),
            (f"{s}.intermediate.dense", f"{d}/intermediate"),
            (f"{s}.output.dense", f"{d}/output"),
        ]
        for src, dst in pairs:
            put(f"{dst}/kernel", np.asarray(sd[f"{src}.weight"]).T)
            put(f"{dst}/bias", sd[f"{src}.bias"])
        put(f"{d}/attn_ln/scale", sd[f"{s}.attention.output.LayerNorm.weight"])
        put(f"{d}/attn_ln/bias", sd[f"{s}.attention.output.LayerNorm.bias"])
        put(f"{d}/out_ln/scale", sd[f"{s}.output.LayerNorm.weight"])
        put(f"{d}/out_ln/bias", sd[f"{s}.output.LayerNorm.bias"])
    return p
