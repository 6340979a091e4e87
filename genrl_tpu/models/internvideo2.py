"""InternVideo2 Stage-2 video-language CLIP, TPU-native (JAX/flax).

Rebuild of the vendored PyTorch stack GenRL uses for video/text embeddings
(reference: third_party/InternVideo/InternVideo2/multi_modality/ —
`PretrainInternVideo2` internvideo2.py:381-723, `InternVideo2_Stage2`
demo/small_utils.py:129-318). Only the inference surface GenRL touches is
built: `get_vid_features(frames[B,T,3,224,224]) -> [B,512]` and
`get_txt_feat(str) -> [1,512]` (tools/genrl_utils.py:190-199).

Architecture (1B config, internvideo2.py:688-692): ViT d1408 x 40 blocks x
16 heads, mlp_ratio 48/11 (hidden 6144), patch14 @ 224, Conv3d tubelet
patch embed, 3D sin-cos pos embed with separate image/video tables, CLS
token, RMSNorm(eps 1e-6) prenorm blocks with full-dim qk-RMSNorm and
LayerScale(1e-5), attention-pooling projector to 768; then a 768->512
`vision_proj` and L2 norm. Text: BERT-large (genrl_tpu/models/bert.py) ->
[CLS] -> `text_proj` 1024->512 -> L2 norm.

The attention runs through the Pallas flash-attention kernel
(genrl_tpu/ops/pallas/flash_attention.py) — the TPU replacement for the
reference's CUDA flash_attn dependency. DropPath/dropout are inference-no-ops
and omitted. The CLIP stays frozen in GenRL, so no training paths.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from genrl_tpu.models.pos_embed import get_3d_sincos_pos_embed
from genrl_tpu.ops.pallas import flash_attention, naive_attention


class RMSNorm(nn.Module):
    """f32 RMS normalization (reference: internvideo2.py:127-138)."""

    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        return (weight * xf.astype(in_dtype).astype(jnp.float32)).astype(in_dtype)


class Attention(nn.Module):
    """Self-attention with full-dim qk-RMSNorm (internvideo2.py:160-224)."""

    dim: int
    num_heads: int
    qkv_bias: bool = False
    qk_normalization: bool = True
    use_flash: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        H = self.num_heads
        D = C // H
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.qk_normalization:
            # norm over the FULL flattened head dim, as the reference
            # (internvideo2.py:188-191), not per-head
            q = RMSNorm(dtype=self.dtype, name="q_norm")(q)
            k = RMSNorm(dtype=self.dtype, name="k_norm")(k)
        split_heads = lambda t: t.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scale = 1.0 / math.sqrt(D)
        attend = flash_attention if self.use_flash else naive_attention
        out = attend(q, k, v, scale=scale)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C).astype(self.dtype)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class Mlp(nn.Module):
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x)


class LayerScale(nn.Module):
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init_values),
                           (x.shape[-1],), jnp.float32)
        return (x.astype(jnp.float32) * gamma).astype(x.dtype)


class Block(nn.Module):
    """Prenorm RMSNorm block with LayerScale (internvideo2.py:258-311)."""

    dim: int
    num_heads: int
    mlp_hidden: int
    init_values: float = 1e-5
    qk_normalization: bool = True
    use_flash: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = RMSNorm(dtype=self.dtype, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, qk_normalization=self.qk_normalization,
                      use_flash=self.use_flash, dtype=self.dtype, name="attn")(h)
        x = x + LayerScale(self.init_values, name="ls1")(h)
        h = RMSNorm(dtype=self.dtype, name="norm2")(x)
        h = Mlp(self.mlp_hidden, dtype=self.dtype, name="mlp")(h)
        x = x + LayerScale(self.init_values, name="ls2")(h)
        return x


class AttentionPoolingBlock(nn.Module):
    """Mean-query cross-attention pool -> out_dim
    (reference: AttentiveBlock/AttentionPoolingBlock, internvideo2.py:60-125)."""

    dim: int
    num_heads: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        H = self.num_heads
        D = C // H
        xq = jnp.mean(x, axis=1, keepdims=True)
        xq = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                          name="norm1_q")(xq)
        xk = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                          name="norm1_k")(x)
        xv = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                          name="norm1_v")(x)
        q = nn.Dense(C, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="q")(xq)
        k = nn.Dense(C, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="k")(xk)
        v = nn.Dense(C, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="v")(xv)
        q = q.reshape(B, 1, H, D).transpose(0, 2, 1, 3) * (1.0 / math.sqrt(D))
        k = k.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32)).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)
        out = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)
        return out[:, 0]


class InternVideo2ViT(nn.Module):
    """The 1B vision tower, inference path (internvideo2.py:381-723)."""

    img_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1408
    depth: int = 40
    num_heads: int = 16
    mlp_ratio: float = 48 / 11
    init_values: float = 1e-5
    qk_normalization: bool = True
    num_frames: int = 8
    tubelet_size: int = 1
    clip_embed_dim: int = 768
    attn_pool_num_heads: int = 16
    sep_image_video_pos_embed: bool = True
    use_flash: bool = True
    dtype: Any = jnp.float32

    @property
    def grid_hw(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return (self.num_frames // self.tubelet_size) * self.grid_hw**2

    @nn.compact
    def __call__(self, x: jax.Array, use_image: bool = False) -> jax.Array:
        """x: [B, T, H, W, 3] float (already resized + ImageNet-normalized).
        Returns pooled clip features [B, clip_embed_dim]."""
        B, T, Hh, Ww, C = x.shape
        # Conv3d tubelet patch embed == per-frame 2D conv when tubelet_size=1
        assert self.tubelet_size == 1, "tubelet>1 not needed by the 1B config"
        x = x.reshape(B * T, Hh, Ww, C).astype(self.dtype)
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32, name="patch_embed")(x)
        x = x.reshape(B, T * self.grid_hw**2, self.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(x.dtype), x], 1)

        n_video = self.num_patches + 1
        pos_embed = self.param(
            "pos_embed",
            lambda k, s: jnp.asarray(get_3d_sincos_pos_embed(
                self.embed_dim, self.grid_hw, self.num_frames // self.tubelet_size,
                cls_token=True), jnp.float32),
            (n_video, self.embed_dim),
        )
        if self.sep_image_video_pos_embed:
            img_pos_embed = self.param(
                "img_pos_embed",
                lambda k, s: jnp.asarray(get_3d_sincos_pos_embed(
                    self.embed_dim, self.grid_hw, 1, cls_token=True), jnp.float32),
                (self.grid_hw**2 + 1, self.embed_dim),
            )
        else:
            img_pos_embed = None
        if use_image:
            if img_pos_embed is not None:
                pos = img_pos_embed
            else:
                cls_pos = pos_embed[:1]
                img_pos = pos_embed[1:].reshape(
                    self.num_frames, self.grid_hw**2, self.embed_dim).mean(0)
                pos = jnp.concatenate([cls_pos, img_pos], 0)
        else:
            pos = pos_embed
        x = x + pos[None].astype(x.dtype)

        for i in range(self.depth):
            x = Block(self.embed_dim, self.num_heads,
                      mlp_hidden=int(self.embed_dim * self.mlp_ratio),
                      init_values=self.init_values,
                      qk_normalization=self.qk_normalization,
                      use_flash=self.use_flash, dtype=self.dtype, name=f"blocks_{i}")(x)

        pooled = AttentionPoolingBlock(
            self.embed_dim, self.attn_pool_num_heads, self.clip_embed_dim,
            dtype=self.dtype, name="clip_projector")(x)
        return pooled.astype(jnp.float32)


class InternVideo2Stage2(nn.Module):
    """Dual-encoder CLIP wrapper (reference: InternVideo2_Stage2,
    demo/small_utils.py:129-318). Exposes encode_vision / encode_text and the
    512-d joint projections."""

    vision_cfg: Any = ()
    text_cfg: Any = ()
    embed_dim: int = 512
    use_flash: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        from genrl_tpu.models.bert import BertEncoder

        self.vision_encoder = InternVideo2ViT(
            use_flash=self.use_flash, dtype=self.dtype, name="vision_encoder",
            **dict(self.vision_cfg))
        self.text_encoder = BertEncoder(dtype=self.dtype, name="text_encoder",
                                        **dict(self.text_cfg))
        self.vision_proj = nn.Dense(self.embed_dim, dtype=self.dtype,
                                    param_dtype=jnp.float32, name="vision_proj")
        self.text_proj = nn.Dense(self.embed_dim, dtype=self.dtype,
                                  param_dtype=jnp.float32, name="text_proj")

    def get_vid_features(self, frames: jax.Array) -> jax.Array:
        """frames [B, T, H, W, 3] preprocessed -> L2-normed [B, 512]
        (reference: small_utils.py:278-294)."""
        use_image = frames.shape[1] == 1
        pooled = self.vision_encoder(frames, use_image=use_image)
        feat = self.vision_proj(pooled.astype(self.dtype)).astype(jnp.float32)
        return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

    def get_txt_feat(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        """Tokenized text -> L2-normed [B, 512] (small_utils.py:296-310)."""
        hidden = self.text_encoder(input_ids, attention_mask)
        pooled = hidden[:, 0]
        feat = self.text_proj(pooled.astype(self.dtype)).astype(jnp.float32)
        return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

    def __call__(self, frames, input_ids, attention_mask):
        return self.get_vid_features(frames), self.get_txt_feat(input_ids, attention_mask)


# ---------------------------------------------------------------------------------
# preprocessing (reference: preprocess_transf, tools/genrl_utils.py:190-192 —
# bilinear resize to 224 + ImageNet normalize, on device)
# ---------------------------------------------------------------------------------

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_frames(frames: jax.Array, size: int = 224) -> jax.Array:
    """uint8/float [..., H, W, 3] -> resized + normalized float32 [..., size, size, 3].
    Runs on-TPU (jax.image.resize), replacing the reference's torchvision CPU
    transform."""
    x = jnp.asarray(frames)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    if x.shape[-2] != size or x.shape[-3] != size:
        shape = x.shape[:-3] + (size, size, x.shape[-1])
        x = jax.image.resize(x, shape, method="bilinear")
    return (x - IMAGENET_MEAN) / IMAGENET_STD


# ---------------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------------


def convert_torch_checkpoint(state_dict: Dict[str, np.ndarray],
                             num_frames: int = 8,
                             grid_hw: int = 16) -> Dict[str, Any]:
    """Map a reference `InternVideo2_Stage2` torch state_dict onto this
    module's param tree. Handles the Conv3d->Conv2d patch-embed squeeze and
    temporal interpolation of trained pos tables when the checkpoint's frame
    count differs (the published f4 checkpoint at n_frames=8; reference:
    interpolate_pos_embed_internvideo2, pos_embed.py:185-298)."""
    import re

    from genrl_tpu.models.pos_embed import interpolate_temporal_pos_embed

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict[str, Any] = {}

    def put(path: str, value: np.ndarray):
        node = p
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)

    def dense(src: str, dst: str, transpose=True):
        if f"{src}.weight" in sd:
            w = sd[f"{src}.weight"]
            put(f"{dst}/kernel", w.T if transpose else w)
        if f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    ve = "vision_encoder"
    # patch embed: torch Conv3d [D, 3, 1, P, P] -> flax Conv [P, P, 3, D]
    w = sd[f"{ve}.patch_embed.proj.weight"]
    put("vision_encoder/patch_embed/kernel", w[:, :, 0].transpose(2, 3, 1, 0))
    put("vision_encoder/patch_embed/bias", sd[f"{ve}.patch_embed.proj.bias"])
    put("vision_encoder/cls_token", sd[f"{ve}.cls_token"][0][None])

    # pos tables with temporal interpolation if needed
    pos = sd[f"{ve}.pos_embed"]
    pos = pos[0] if pos.ndim == 3 else pos
    src_t = (pos.shape[0] - 1) // (grid_hw**2)
    if src_t != num_frames:
        pos = interpolate_temporal_pos_embed(pos, src_t, num_frames, grid_hw**2)
    put("vision_encoder/pos_embed", pos)
    if f"{ve}.img_pos_embed" in sd:
        ipos = sd[f"{ve}.img_pos_embed"]
        put("vision_encoder/img_pos_embed", ipos[0] if ipos.ndim == 3 else ipos)

    n_blocks = max(int(m.group(1)) for k in sd
                   for m in [re.match(rf"{ve}\.blocks\.(\d+)\.", k)] if m) + 1
    for i in range(n_blocks):
        s = f"{ve}.blocks.{i}"
        d = f"vision_encoder/blocks_{i}"
        put(f"{d}/norm1/weight", sd[f"{s}.norm1.weight"])
        put(f"{d}/norm2/weight", sd[f"{s}.norm2.weight"])
        dense(f"{s}.attn.qkv", f"{d}/attn/qkv")
        dense(f"{s}.attn.proj", f"{d}/attn/proj")
        put(f"{d}/attn/q_norm/weight", sd[f"{s}.attn.q_norm.weight"])
        put(f"{d}/attn/k_norm/weight", sd[f"{s}.attn.k_norm.weight"])
        put(f"{d}/ls1/gamma", sd[f"{s}.ls1.gamma"])
        put(f"{d}/ls2/gamma", sd[f"{s}.ls2.gamma"])
        dense(f"{s}.mlp.fc1", f"{d}/mlp/fc1")
        dense(f"{s}.mlp.fc2", f"{d}/mlp/fc2")

    # attention pooling projector
    s = f"{ve}.clip_projector"
    d = "vision_encoder/clip_projector"
    for nm in ("norm1_q", "norm1_k", "norm1_v"):
        put(f"{d}/{nm}/scale", sd[f"{s}.{nm}.weight"])
        put(f"{d}/{nm}/bias", sd[f"{s}.{nm}.bias"])
    ca = f"{s}.cross_attn"
    for nm in ("q", "k", "v"):
        put(f"{d}/{nm}/kernel", sd[f"{ca}.{nm}.weight"].T)
        put(f"{d}/{nm}/bias", sd[f"{ca}.{nm}_bias"])
    dense(f"{ca}.proj", f"{d}/proj")

    dense("vision_proj", "vision_proj")
    dense("text_proj", "text_proj")

    # text encoder (BERT) — delegate; optional for vision-only checkpoints
    from genrl_tpu.models.bert import convert_bert_state_dict

    for prefix in ("text_encoder.bert.", "text_encoder."):
        if f"{prefix}embeddings.word_embeddings.weight" in sd:
            p["text_encoder"] = convert_bert_state_dict(sd, prefix=prefix)
            break
    return {"params": p}


# ---------------------------------------------------------------------------------
# tensor-parallel sharding rules (for the 6B tower on multi-chip meshes)
# ---------------------------------------------------------------------------------


def iv2_param_shardings(params, mesh):
    """Megatron-style model-axis PartitionSpecs for the ViT tower: qkv/fc1
    column-parallel (output dim on 'model'), proj/fc2 row-parallel (input dim
    on 'model'); everything else replicated. The activation all-reduce after
    proj/fc2 is inserted by XLA. The 1B tower fits one chip; this is the
    scale-out path the 6B variant needs (SURVEY.md §2.10 TP row)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec_for(path_parts, leaf):
        path = "/".join(str(p) for p in path_parts)
        if "kernel" in path:
            if "attn/qkv" in path or "mlp/fc1" in path:
                return P(None, "model")  # column parallel
            if "attn/proj" in path or "mlp/fc2" in path:
                return P("model", None)  # row parallel
        if "bias" in path and ("attn/qkv" in path or "mlp/fc1" in path):
            return P("model")
        return P()

    import jax

    def to_sharding(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", "")) for p in path]
        return NamedSharding(mesh, spec_for(keys, leaf))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


# ---------------------------------------------------------------------------------
# global instance (reference: ViCLIPGlobalInstance, tools/genrl_utils.py:155-199)
# ---------------------------------------------------------------------------------

_GLOBAL: Dict[str, Any] = {}


def get_global_instance(model: str = "internvideo2", models_root: str = "models",
                        checkpoint: Optional[str] = None, use_flash: bool = True,
                        mesh=None):
    """Lazy singleton wrapper exposing get_txt_feat / get_vid_features /
    preprocess + n_frames, like the reference's ViCLIPGlobalInstance.
    `mesh` (with a model axis > 1) turns on tensor-parallel execution of the
    ViT tower; it only applies on first construction of the singleton."""
    key = f"{model}:{models_root}"
    if key not in _GLOBAL:
        from genrl_tpu.models.clip_wrapper import ViCLIP

        _GLOBAL[key] = ViCLIP(models_root=models_root, checkpoint=checkpoint,
                              use_flash=use_flash, mesh=mesh)
    return _GLOBAL[key]
