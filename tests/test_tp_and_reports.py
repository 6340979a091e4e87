"""Tensor-parallel sharding of the ViT tower on the CPU mesh +
report_text2video panels with a tiny random-weight clip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_iv2_tensor_parallel_forward():
    """Shard a small ViT over (data=2, model=4); forward must match the
    replicated result (XLA inserts the TP collectives)."""
    from genrl_tpu.models.internvideo2 import InternVideo2ViT, iv2_param_shardings
    from genrl_tpu.parallel import make_mesh, replicated

    mesh = make_mesh(data=2, model=4)
    # head count divisible by model axis; dims lane-friendly
    vit = InternVideo2ViT(img_size=28, patch_size=14, embed_dim=64, depth=2,
                          num_heads=4, mlp_ratio=2.0, num_frames=2,
                          clip_embed_dim=16, attn_pool_num_heads=4,
                          sep_image_video_pos_embed=True, use_flash=False)
    x = np.float32(np.random.default_rng(0).normal(size=(2, 2, 28, 28, 3)))
    params = vit.init(jax.random.PRNGKey(0), jnp.asarray(x))

    ref = np.asarray(vit.apply(params, jnp.asarray(x)))

    shardings = iv2_param_shardings(params, mesh)
    # sanity: qkv kernels sharded on model axis, pos tables replicated
    qkv = shardings["params"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert "model" in str(qkv.spec)
    params_tp = jax.device_put(params, shardings)
    out = jax.jit(vit.apply)(params_tp, jax.device_put(jnp.asarray(x),
                                                       replicated(mesh)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_vit_6b_tp_shardings_shape_level():
    """The 6B scale-out path at shape level (VIT_6B is reference
    internvideo2.py:726-761): eval_shape the full 6B param tree — no
    materialization — and assert every model-axis-sharded kernel dimension
    divides by the mesh axis, so device_put/pjit would place it exactly."""
    from jax.sharding import PartitionSpec as P

    from genrl_tpu.models.clip_wrapper import VIT_6B
    from genrl_tpu.models.internvideo2 import InternVideo2ViT, iv2_param_shardings
    from genrl_tpu.parallel import make_mesh

    mesh = make_mesh(data=1, model=8)
    vit = InternVideo2ViT(use_flash=False, **VIT_6B)
    x = jax.ShapeDtypeStruct((1, VIT_6B["num_frames"], 224, 224, 3), jnp.float32)
    shapes = jax.eval_shape(vit.init, jax.random.PRNGKey(0), x)

    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(shapes))
    assert n_params > 5.5e9, f"6B tower should have >5.5B params, got {n_params/1e9:.2f}B"

    shardings = iv2_param_shardings(shapes, mesh)
    n_model_sharded = 0
    for (path, leaf), (_, sh) in zip(
            jax.tree_util.tree_leaves_with_path(shapes),
            jax.tree_util.tree_leaves_with_path(shardings)):
        spec = sh.spec
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis]
            assert leaf.shape[dim] % size == 0, (
                f"{jax.tree_util.keystr(path)}: dim {dim} ({leaf.shape[dim]}) "
                f"not divisible by mesh axis {axis} ({size})")
            n_model_sharded += 1
    # 48 blocks x (qkv/proj/fc1/fc2 kernels + fc1 bias; qkv has no bias)
    assert n_model_sharded >= 48 * 5
    # spot-check the megatron pattern
    qkv = shardings["params"]["blocks_0"]["attn"]["qkv"]["kernel"].spec
    fc2 = shardings["params"]["blocks_0"]["mlp"]["fc2"]["kernel"].spec
    assert qkv == P(None, "model") and fc2 == P("model", None)


def test_vit_6b_proportional_tp_forward():
    """End-to-end TP forward at 6B-proportional toy scale: same head count
    (25 — NOT divisible by the model axis, like the real 6B tower) and
    mlp_ratio; XLA must insert the TP collectives and still match the
    replicated result."""
    from genrl_tpu.models.internvideo2 import InternVideo2ViT, iv2_param_shardings
    from genrl_tpu.parallel import make_mesh, replicated

    mesh = make_mesh(data=2, model=4)
    vit = InternVideo2ViT(img_size=28, patch_size=14, embed_dim=400, depth=2,
                          num_heads=25, mlp_ratio=4.0, num_frames=2,
                          clip_embed_dim=16, attn_pool_num_heads=25,
                          sep_image_video_pos_embed=True, use_flash=False)
    x = np.float32(np.random.default_rng(1).normal(size=(2, 2, 28, 28, 3)))
    params = vit.init(jax.random.PRNGKey(1), jnp.asarray(x))
    ref = np.asarray(vit.apply(params, jnp.asarray(x)))

    params_tp = jax.device_put(params, iv2_param_shardings(params, mesh))
    out = jax.jit(vit.apply)(params_tp, jax.device_put(jnp.asarray(x),
                                                       replicated(mesh)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_report_text2video(tmp_path):
    from genrl_tpu.agents.assembly import GenRLAgent
    from genrl_tpu.configs import TRAIN_BASE
    from genrl_tpu.models.clip_wrapper import ViCLIP
    from genrl_tpu.utils.config import Config

    cfg = Config.from_dict(TRAIN_BASE)
    cfg.update_deep(dict(
        rssm=dict(ensemble=1, hidden=32, deter=32, stoch=4, discrete=4,
                  norm="layer", std_act="softplus", min_std=0.1,
                  single_obs_posterior=True),
        encoder=dict(cfg.encoder.to_dict(), cnn_depth=8, cnn_kernels=(4, 4)),
        decoder=dict(cfg.decoder.to_dict(), cnn_depth=8, cnn_kernels=(6, 6)),
        reward_head=dict(layers=2, units=32, norm="layer", dist="twohot"),
        discount_head=dict(layers=2, units=32, norm="none", dist="binary"),
        actor=dict(layers=2, units=32, norm="layer", dist="normal", min_std=0.1),
        critic=dict(layers=2, units=32, norm="layer", dist="twohot"),
        precision=32,
    ))
    cfg.update_deep({"agent": {"connector_rssm": dict(
        ensemble=1, hidden=32, deter=32, stoch=4, discrete=4, norm="layer",
        std_act="softplus", min_std=0.1, single_obs_posterior=False,
        learn_initial=True)}})
    agent = GenRLAgent(cfg, {"observation": (16, 16, 3)}, 4,
                       viclip_emb_dim=512, n_frames=4)
    state = agent.init(jax.random.PRNGKey(0))

    clip = ViCLIP(models_root=str(tmp_path), use_flash=False, n_frames=2,
                  dtype=jnp.float32,
                  vision_cfg=dict(img_size=28, patch_size=14, embed_dim=32,
                                  depth=1, num_heads=4, mlp_ratio=2.0,
                                  num_frames=2, clip_embed_dim=16,
                                  attn_pool_num_heads=4,
                                  sep_image_video_pos_embed=True),
                  text_cfg=dict(vocab_size=30522, hidden=32, layers=1, heads=4,
                                intermediate=64))
    videos = agent.report_text2video(state, clip, "stickman_walk",
                                     jax.random.PRNGKey(1))
    assert len(videos) == 12  # stickman predicates
    v = next(iter(videos.values()))
    assert v.shape == (1, 8, 16, 16, 3)
    assert float(jnp.min(v)) >= 0 and float(jnp.max(v)) <= 1


def test_viclip_wrapper_tp_config_path():
    """TP as a *config path*: ViCLIP(mesh=model>1) shards its params at load
    and the user-facing get_vid_features executes sharded (VERDICT r2 #6)."""
    from genrl_tpu.models.clip_wrapper import ViCLIP
    from genrl_tpu.parallel import make_mesh

    mesh = make_mesh(data=4, model=2)
    vit_tiny = dict(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=2, mlp_ratio=4.0, num_frames=4,
                    clip_embed_dim=32, sep_image_video_pos_embed=True)
    bert_tiny = dict(vocab_size=128, hidden=32, layers=2, heads=2,
                     intermediate=64)
    clip = ViCLIP(models_root="/nonexistent", vision_cfg=vit_tiny,
                  text_cfg=bert_tiny, use_flash=False, dtype=jnp.float32,
                  n_frames=4, embed_dim=32, mesh=mesh)
    # params actually sharded over the model axis
    assert any(not x.sharding.is_fully_replicated
               for x in jax.tree_util.tree_leaves(clip.params))
    frames = np.random.default_rng(0).integers(
        0, 255, (2, 4, 3, 32, 32)).astype(np.uint8)
    feats = clip.get_vid_features(frames)
    assert feats.shape == (2, 32) and np.isfinite(feats).all()
    # unsharded singleton produces identical embeddings (TP is semantics-free)
    clip_rep = ViCLIP(models_root="/nonexistent", vision_cfg=vit_tiny,
                      text_cfg=bert_tiny, use_flash=False, dtype=jnp.float32,
                      n_frames=4, embed_dim=32)
    np.testing.assert_allclose(
        feats, clip_rep.get_vid_features(frames), atol=2e-4)
