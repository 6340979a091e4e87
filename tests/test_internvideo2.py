"""InternVideo2 JAX port: kernel correctness, BERT parity vs a local
transformers reference, ViT parity vs the reference torch implementation
(imported from /root/reference with CUDA-dep stubs), tokenizer, wrapper."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# ---- flash attention -------------------------------------------------------------


def test_flash_attention_matches_naive():
    from genrl_tpu.ops.pallas import flash_attention, naive_attention

    rng = np.random.default_rng(0)
    q, k, v = (np.float32(rng.normal(size=(2, 3, 130, 24))) for _ in range(3))
    ref = naive_attention(q, k, v)
    out = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


# ---- BERT parity vs transformers ---------------------------------------------------


def test_bert_matches_transformers_local():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    from genrl_tpu.models.bert import BertEncoder, convert_bert_state_dict

    cfg = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=48, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0, hidden_act="gelu")
    tmodel = BertModel(cfg, add_pooling_layer=False).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    jmodel = BertEncoder(vocab_size=120, hidden=32, layers=2, heads=4,
                         intermediate=64, max_position=48)
    params = {"params": convert_bert_state_dict(sd, prefix="")}

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 120, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    mask[1, 6:] = 0
    with torch.no_grad():
        ref = tmodel(input_ids=torch.tensor(ids.astype(np.int64)),
                     attention_mask=torch.tensor(mask.astype(np.int64))
                     ).last_hidden_state.numpy()
    out = np.asarray(jmodel.apply(params, jnp.asarray(ids), jnp.asarray(mask)))
    # padded positions attend differently in HF (they still produce outputs);
    # compare only valid positions
    np.testing.assert_allclose(out[0], ref[0], atol=2e-4)
    np.testing.assert_allclose(out[1, :6], ref[1, :6], atol=2e-4)


# ---- ViT parity vs the reference torch implementation --------------------------------


def _import_reference_vit():
    """Import the reference PretrainInternVideo2 with stubs for its CUDA-only
    deps (timm, flash_attn). PUBLIC UNTRUSTED CONTENT — used here only as a
    numerical oracle in tests; nothing is copied into the framework."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    if "timm.models.layers" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(nn.Module):
            def __init__(self, p=0.0):
                super().__init__()

            def forward(self, x):
                return x

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        def trunc_normal_(t, std=1.0):
            with torch.no_grad():
                t.normal_(0, std)
            return t

        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = trunc_normal_
        timm.models = models
        models.layers = layers
        import importlib.machinery as _im

        for name, mod in (("timm", timm), ("timm.models", models),
                          ("timm.models.layers", layers)):
            # a real ModuleSpec so transformers' find_spec probe for timm
            # doesn't crash when it runs in the same process
            mod.__spec__ = _im.ModuleSpec(name, loader=None)
            sys.modules[name] = mod
    for name in ("flash_attn", "flash_attn.flash_attn_interface", "flash_attn.bert_padding"):
        if name not in sys.modules:
            import importlib.machinery as _im

            m = types.ModuleType(name)
            m.flash_attn_varlen_qkvpacked_func = None
            m.unpad_input = None
            m.pad_input = None
            m.__spec__ = _im.ModuleSpec(name, loader=None)
            sys.modules[name] = m
    sys.path.insert(0, "/root/reference/third_party/InternVideo/InternVideo2/"
                       "multi_modality/models/backbones/internvideo2")
    try:
        import importlib

        import pos_embed as ref_pos_embed  # noqa: F401
        spec = importlib.util.spec_from_file_location(
            "ref_internvideo2",
            "/root/reference/third_party/InternVideo/InternVideo2/multi_modality/"
            "models/backbones/internvideo2/internvideo2.py")
        mod = importlib.util.module_from_spec(spec)
        # satisfy its relative-style imports
        sys.modules["ref_internvideo2"] = mod
        src = open(spec.origin).read()
        src = src.replace("from .pos_embed import", "from pos_embed import")
        src = src.replace("from .flash_attention_class import FlashAttention",
                          "FlashAttention = None")
        exec(compile(src, spec.origin, "exec"), mod.__dict__)
        return mod
    finally:
        sys.path.pop(0)


@pytest.mark.slow
def test_vit_matches_reference_torch():
    torch = pytest.importorskip("torch")
    ref_mod = _import_reference_vit()

    from genrl_tpu.models.internvideo2 import InternVideo2ViT, convert_torch_checkpoint

    # tiny but structurally faithful config
    D, depth, heads, frames, img, patch = 32, 2, 4, 2, 28, 14
    tref = ref_mod.PretrainInternVideo2(
        in_chans=3, patch_size=patch, img_size=img, qkv_bias=False,
        drop_path_rate=0.0, embed_dim=D, num_heads=heads, mlp_ratio=2.0,
        init_values=1e-5, qk_normalization=True, depth=depth,
        use_flash_attn=False, use_fused_rmsnorm=False, use_fused_mlp=False,
        attn_pool_num_heads=4, clip_embed_dim=16, num_frames=frames,
        tubelet_size=1, sep_image_video_pos_embed=True,
        clip_teacher_embed_dim=8, clip_teacher_final_dim=8,
    ).eval()

    sd = {f"vision_encoder.{k}": v.detach().float().numpy()
          for k, v in tref.state_dict().items()}
    # minimal extras so the converter finds projections + (empty) bert
    sd["vision_proj.weight"] = np.eye(16, dtype=np.float32)
    sd["vision_proj.bias"] = np.zeros(16, np.float32)
    sd["text_proj.weight"] = np.eye(16, dtype=np.float32)
    sd["text_proj.bias"] = np.zeros(16, np.float32)

    jvit = InternVideo2ViT(img_size=img, patch_size=patch, embed_dim=D, depth=depth,
                           num_heads=heads, mlp_ratio=2.0, num_frames=frames,
                           clip_embed_dim=16, attn_pool_num_heads=4,
                           sep_image_video_pos_embed=True, use_flash=False)
    full = convert_torch_checkpoint(sd, num_frames=frames, grid_hw=img // patch)
    params = {"params": full["params"]["vision_encoder"]}

    rng = np.random.default_rng(0)
    x = np.float32(rng.normal(size=(2, frames, img, img, 3)) * 0.5)
    with torch.no_grad():
        # reference eats [B, C, T, H, W]
        xt = torch.tensor(x.transpose(0, 4, 1, 2, 3))
        ref_pooled = tref(xt, None, use_image=False)[1].numpy()
    out = np.asarray(jvit.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref_pooled, atol=5e-4)


def _fixture_frames(n_frames=8):
    """8 evenly-spaced frames from the reference stickman fixture episode."""
    import glob

    eps = sorted(glob.glob("/root/reference/data/stickman_example/*.npz"))
    obs = np.load(eps[0])["observation"]  # [T, 3, 64, 64] u8
    idx = np.linspace(0, len(obs) - 1, n_frames).astype(int)
    return obs[idx].transpose(0, 2, 3, 1)  # [T, 64, 64, 3] u8


@pytest.mark.slow
def test_iv2_full_width_parity_and_converter():
    """SURVEY §7.7 / VERDICT #2: the REAL reference `PretrainInternVideo2` at
    the 1B tower's full width (d1408, 16 heads, mlp 48/11, qk-RMSNorm,
    LayerScale, attn-pool 768) with random weights; its full state_dict —
    including the UMT clip-decoder keys our converter must skip — goes
    through `convert_torch_checkpoint`, and video features must match at
    cosine >= 0.999 on the stickman fixture frames. Depth defaults to 4
    full-width blocks on the 1-core test VM; set GENRL_IV2_PARITY_DEPTH=40
    for the full 1B tower (same code path, ~10x slower)."""
    import os

    torch = pytest.importorskip("torch")
    ref_mod = _import_reference_vit()
    from genrl_tpu.models.internvideo2 import (InternVideo2ViT,
                                               convert_torch_checkpoint,
                                               preprocess_frames)

    depth = int(os.environ.get("GENRL_IV2_PARITY_DEPTH", "4"))
    tref = ref_mod.PretrainInternVideo2(
        in_chans=3, patch_size=14, img_size=224, qkv_bias=False,
        drop_path_rate=0.0, embed_dim=1408, num_heads=16, mlp_ratio=48 / 11,
        init_values=1e-5, qk_normalization=True, depth=depth,
        use_flash_attn=False, use_fused_rmsnorm=False, use_fused_mlp=False,
        attn_pool_num_heads=16, clip_embed_dim=768, num_frames=8,
        tubelet_size=1, sep_image_video_pos_embed=True,
        clip_teacher_embed_dim=3200, clip_teacher_final_dim=768,
    ).eval()

    # full state_dict, reference naming — converter must ignore the clip
    # decoder / final_clip_decoder heads (unused at inference)
    sd = {f"vision_encoder.{k}": v.detach().float().numpy()
          for k, v in tref.state_dict().items()}
    assert any("clip_decoder" in k for k in sd), "expected UMT heads in the state_dict"
    rng = np.random.default_rng(0)
    sd["vision_proj.weight"] = np.float32(rng.normal(size=(512, 768)) * 0.02)
    sd["vision_proj.bias"] = np.zeros(512, np.float32)

    jvit = InternVideo2ViT(img_size=224, patch_size=14, embed_dim=1408,
                           depth=depth, num_heads=16, mlp_ratio=48 / 11,
                           num_frames=8, clip_embed_dim=768,
                           attn_pool_num_heads=16,
                           sep_image_video_pos_embed=True, use_flash=False)
    full = convert_torch_checkpoint(sd, num_frames=8, grid_hw=16)
    params = {"params": full["params"]["vision_encoder"]}

    x = np.asarray(preprocess_frames(jnp.asarray(_fixture_frames(8))))[None]
    with torch.no_grad():
        xt = torch.tensor(x.transpose(0, 4, 1, 2, 3))  # [B, C, T, H, W]
        ref_pooled = tref(xt, None, use_image=False)[1].numpy()
    out = np.asarray(jvit.apply(params, jnp.asarray(x)))

    def cos(a, b):
        return float(np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    c = cos(out, ref_pooled)
    assert c >= 0.999, f"pooled ViT cosine {c}"
    # through the 512-d joint projection + L2 norm (the GenRL-visible output)
    wj = np.asarray(full["params"]["vision_proj"]["kernel"])
    bj = np.asarray(full["params"]["vision_proj"]["bias"])
    ours = out @ wj + bj
    ours /= np.linalg.norm(ours)
    refs = ref_pooled @ sd["vision_proj.weight"].T + sd["vision_proj.bias"]
    refs /= np.linalg.norm(refs)
    assert cos(ours, refs) >= 0.999


@pytest.mark.slow
def test_bert_large_full_scale_parity():
    """Full BERT-large config (1024x24x16, the reference text tower) with
    random weights vs the transformers oracle at the reference's 40-token
    budget (max_txt_l, demo/internvideo2_stage2_config.py)."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    from genrl_tpu.models.bert import BertEncoder, convert_bert_state_dict

    cfg = BertConfig(vocab_size=30522, hidden_size=1024, num_hidden_layers=24,
                     num_attention_heads=16, intermediate_size=4096,
                     max_position_embeddings=512, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0, hidden_act="gelu")
    tmodel = BertModel(cfg, add_pooling_layer=False).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    jmodel = BertEncoder(vocab_size=30522, hidden=1024, layers=24, heads=16,
                         intermediate=4096, max_position=512)
    params = {"params": convert_bert_state_dict(sd, prefix="")}

    ids = np.random.default_rng(1).integers(1, 30522, (2, 40)).astype(np.int32)
    mask = np.ones((2, 40), np.int32)
    with torch.no_grad():
        ref = tmodel(input_ids=torch.tensor(ids.astype(np.int64)),
                     attention_mask=torch.tensor(mask.astype(np.int64))
                     ).last_hidden_state.numpy()
    out = np.asarray(jmodel.apply(params, jnp.asarray(ids), jnp.asarray(mask)))
    cls_cos = np.sum(out[:, 0] * ref[:, 0], -1) / (
        np.linalg.norm(out[:, 0], axis=-1) * np.linalg.norm(ref[:, 0], axis=-1))
    assert np.all(cls_cos >= 0.999), cls_cos
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_temporal_pos_interp_matches_reference_torch():
    """Our f4->f8 temporal pos-table interpolation vs the reference's
    interpolate_pos_embed_internvideo2 (pos_embed.py:185-237), which uses
    torch F.interpolate(mode='linear', align_corners=False)."""
    import types as _types

    torch = pytest.importorskip("torch")
    _import_reference_vit()  # ensures sys.path stubs exist
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "ref_pos_embed",
        "/root/reference/third_party/InternVideo/InternVideo2/multi_modality/"
        "models/backbones/internvideo2/pos_embed.py")
    ref_pe = ilu.module_from_spec(spec)
    spec.loader.exec_module(ref_pe)

    from genrl_tpu.models.pos_embed import interpolate_temporal_pos_embed

    rng = np.random.default_rng(2)
    S, D, src_t, dst_t = 49, 64, 4, 8
    table = np.float32(rng.normal(size=(1, 1 + src_t * S, D)))

    fake_model = _types.SimpleNamespace(
        patch_embed=_types.SimpleNamespace(num_patches=dst_t * S),
        pos_embed=torch.zeros(1, 1 + dst_t * S, D),
        num_frames=dst_t, tubelet_size=1)
    ckpt = {"pos_embed": torch.tensor(table)}
    ref_pe.interpolate_pos_embed_internvideo2(ckpt, fake_model, orig_t_size=src_t)
    ref_out = ckpt["pos_embed"].numpy()[0]

    ours = interpolate_temporal_pos_embed(table[0], src_t, dst_t, S)
    np.testing.assert_allclose(ours, ref_out, atol=1e-6)


# ---- tokenizer ------------------------------------------------------------------


def test_wordpiece_tokenizer(tmp_path):
    from genrl_tpu.models.tokenizer import BertTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "robot", "walk", "##ing",
             "fast", "clean", ","]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab))
    tok = BertTokenizer(p)
    assert tok.tokenize("Robot walking fast, clean") == [
        "robot", "walk", "##ing", "fast", ",", "clean"]
    ids, mask = tok.encode("robot walking", max_length=8)
    assert ids.shape == (1, 8)
    assert ids[0, 0] == 2 and ids[0, 4] == 3  # CLS ... SEP
    assert mask[0].sum() == 5


# ---- wrapper smoke ------------------------------------------------------------------


def test_viclip_wrapper_random_weights(tmp_path):
    from genrl_tpu.models.clip_wrapper import ViCLIP

    clip = ViCLIP(models_root=str(tmp_path), use_flash=False, dtype=jnp.float32,
                  n_frames=2,
                  vision_cfg=dict(img_size=28, patch_size=14, embed_dim=32, depth=2,
                                  num_heads=4, mlp_ratio=2.0, num_frames=2,
                                  clip_embed_dim=16, attn_pool_num_heads=4,
                                  sep_image_video_pos_embed=True),
                  text_cfg=dict(vocab_size=30522, hidden=32, layers=2, heads=4,
                                intermediate=64))
    frames = np.random.default_rng(0).integers(0, 255, (1, 2, 3, 32, 32), np.uint8)
    v = clip.get_vid_features(frames)
    assert v.shape == (1, 512)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-3)
    t = clip.get_txt_feat("robot walk fast clean")
    assert t.shape == (512,)
    np.testing.assert_allclose(np.linalg.norm(t), 1.0, atol=1e-3)
