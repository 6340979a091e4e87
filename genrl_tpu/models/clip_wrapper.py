"""ViCLIP: the user-facing InternVideo2 handle.

Rebuild of the reference's `ViCLIPGlobalInstance` + model surface
(tools/genrl_utils.py:155-199): loads the checkpoint + tokenizer vocab from
a models root, jits the two encoders once, and exposes

    get_vid_features(frames[B, T, 3|last, H, W]) -> np[B, 512]
    get_txt_feat(str) -> np[512]
    get_vid_features_from_file(path) -> np[512]   (cv2 decode, 8-frame sample)

plus `n_frames` and `viclip_emb_dim`. Frames are resized/normalized ON
DEVICE (jax.image.resize), replacing the reference's torchvision CPU
transform. Without a checkpoint on disk the wrapper still works with random
weights (shape-true), printing a loud warning — useful for integration tests
and dry runs in hermetic environments.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

VIT_1B = dict(
    img_size=224, patch_size=14, embed_dim=1408, depth=40, num_heads=16,
    mlp_ratio=48 / 11, num_frames=8, clip_embed_dim=768,
    sep_image_video_pos_embed=True,
)
# reference 6B factory (internvideo2.py:726-761); needs model-axis sharding
# (models/internvideo2.py:iv2_param_shardings) on multi-chip meshes
VIT_6B = dict(
    img_size=224, patch_size=14, embed_dim=3200, depth=48, num_heads=25,
    mlp_ratio=4.0, num_frames=8, clip_embed_dim=768,
    sep_image_video_pos_embed=True,
)
BERT_LARGE = dict(vocab_size=30522, hidden=1024, layers=24, heads=16,
                  intermediate=4096)


class ViCLIP:
    def __init__(self, models_root: str = "models", checkpoint: Optional[str] = None,
                 vision_cfg: Optional[dict] = None, text_cfg: Optional[dict] = None,
                 use_flash: bool = True, dtype=jnp.bfloat16, n_frames: int = 8,
                 embed_dim: int = 512, vocab_path: Optional[str] = None,
                 mesh=None, random_ok: bool = False):
        # random_ok: the caller explicitly wants random weights (shape/dry
        # runs, TP compile checks) — demote the missing-checkpoint WARNINGs
        # to one info line so driver artifacts stay clean (VERDICT r4 item 8)
        from genrl_tpu.models.internvideo2 import InternVideo2Stage2, convert_torch_checkpoint

        self.n_frames = n_frames
        root = Path(models_root)
        ckpt = Path(checkpoint) if checkpoint else root / "InternVideo2-stage2_1b-224p-f4.pt"
        sd = None
        if ckpt.exists():
            import torch

            sd = torch.load(ckpt, map_location="cpu")
            sd = sd.get("module", sd.get("model", sd))
            sd = {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
            if "vision_proj.weight" in sd:
                # joint-space width comes from the checkpoint itself — the
                # reference probes viclip_emb_dim with a zero forward
                # (tools/genrl_utils.py:189-199); reading the projection
                # shape is the load-time equivalent
                embed_dim = int(sd["vision_proj.weight"].shape[0])
        self.viclip_emb_dim = embed_dim
        vision_cfg = dict(VIT_1B if vision_cfg is None else vision_cfg, num_frames=n_frames)
        text_cfg = dict(BERT_LARGE if text_cfg is None else text_cfg)
        self.model = InternVideo2Stage2(
            vision_cfg=tuple(sorted(vision_cfg.items())),
            text_cfg=tuple(sorted(text_cfg.items())),
            embed_dim=embed_dim, use_flash=use_flash, dtype=dtype)
        self._vision_cfg = vision_cfg
        self._text_cfg = text_cfg

        if sd is not None:
            self.params = convert_torch_checkpoint(
                sd, num_frames=n_frames,
                grid_hw=vision_cfg["img_size"] // vision_cfg["patch_size"])
            print(f"viclip: loaded checkpoint {ckpt} (embed_dim {embed_dim})")
        else:
            if random_ok:
                print("viclip: random-init weights (explicitly requested)")
            else:
                print(f"viclip: WARNING no checkpoint at {ckpt} — RANDOM weights "
                      "(embeddings will be meaningless; fine for shape/dry runs)")
            self.params = self._random_init()

        vocab = Path(vocab_path) if vocab_path else root / "bert-large-uncased" / "vocab.txt"
        self.tokenizer = None
        if vocab.exists():
            from genrl_tpu.models.tokenizer import BertTokenizer

            self.tokenizer = BertTokenizer(vocab)
        elif not random_ok:
            print(f"viclip: WARNING no vocab at {vocab} — get_txt_feat will hash-tokenize")

        # tensor parallelism as a config path (SURVEY §2.10 TP row): with a
        # mesh whose `model` axis > 1, the ViT tower's qkv/fc1 become
        # column-parallel and proj/fc2 row-parallel (iv2_param_shardings);
        # jit reads the param shardings off the arrays, XLA inserts the
        # activation all-reduces over ICI
        self.mesh = mesh
        if mesh is not None and dict(mesh.shape).get("model", 1) > 1:
            from genrl_tpu.models.internvideo2 import iv2_param_shardings

            self.params = jax.device_put(
                self.params, iv2_param_shardings(self.params, mesh))
            print(f"viclip: tensor-parallel over model axis = "
                  f"{dict(mesh.shape)['model']}")

        self._jit_vid = jax.jit(
            lambda p, f: self.model.apply(p, f, method="get_vid_features"))
        self._jit_txt = jax.jit(
            lambda p, ids, mask: self.model.apply(p, ids, mask, method="get_txt_feat"))

    def _random_init(self):
        # shape-only init: jax.eval_shape traces without compute — a real
        # model.init would EXECUTE the full 1B forward (minutes on a 1-core
        # host); random-weight mode only needs shape-true params
        frames = jax.ShapeDtypeStruct(
            (1, self.n_frames, self._vision_cfg["img_size"],
             self._vision_cfg["img_size"], 3), jnp.float32)
        ids = jax.ShapeDtypeStruct((1, 8), jnp.int32)
        mask = jax.ShapeDtypeStruct((1, 8), jnp.int32)
        shapes = jax.eval_shape(self.model.init, jax.random.PRNGKey(0),
                                frames, ids, mask)
        rng = np.random.default_rng(0)

        def materialize(path, s):
            name = str(path[-1].key) if path else ""
            if name in ("bias",) or "norm" in str(path).lower():
                base = np.zeros(s.shape) if name == "bias" else np.ones(s.shape)
            else:
                base = rng.normal(0.0, 0.02, s.shape)
            return jnp.asarray(base, s.dtype)

        return jax.tree_util.tree_map_with_path(materialize, shapes)

    # ---- public surface ------------------------------------------------------
    def preprocess_transf(self, frames: np.ndarray) -> jax.Array:
        """[..., 3, H, W] or [..., H, W, 3] uint8/float -> normalized 224."""
        from genrl_tpu.models.internvideo2 import preprocess_frames

        x = np.asarray(frames)
        if x.shape[-3] == 3 and x.shape[-1] != 3:  # CHW -> HWC
            x = np.moveaxis(x, -3, -1)
        return preprocess_frames(x, self._vision_cfg["img_size"])

    def get_vid_features(self, frames) -> np.ndarray:
        """frames [B, T, 3, H, W] (reference layout) or [B, T, H, W, 3]."""
        x = self.preprocess_transf(frames)
        return np.asarray(self._jit_vid(self.params, x))

    def get_txt_feat(self, text: str) -> np.ndarray:
        if self.tokenizer is not None:
            ids, mask = self.tokenizer.encode(text, max_length=40)
        else:  # deterministic fallback without a vocab file
            toks = [abs(hash(w)) % 30000 + 100 for w in text.lower().split()][:38]
            ids = np.asarray([[101] + toks + [102] + [0] * (38 - len(toks))], np.int32)
            mask = (ids != 0).astype(np.int32)
        return np.asarray(self._jit_txt(self.params, ids, mask))[0]

    def get_vid_features_from_file(self, path: str) -> np.ndarray:
        """Decode a video/gif with OpenCV, subsample n_frames, embed
        (reference: _frame_from_video/frames2tensor, tools/genrl_utils.py:105-153)."""
        import cv2

        cap = cv2.VideoCapture(str(path))
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        cap.release()
        if not frames:
            raise ValueError(f"no frames decoded from {path}")
        idx = np.linspace(0, len(frames) - 1, self.n_frames).round().astype(int)
        clip = np.stack([frames[i] for i in idx], 0)[None]  # [1, T, H, W, 3]
        return self.get_vid_features(clip)[0]
