"""Benchmark ALL five BASELINE.md north-star configs on real TPU hardware,
with per-config FLOPs/step (from the compiled executable's cost analysis)
and MFU against the chip's peak.

Configs (BASELINE.md "Measured configs"):
  1. stickman_walk DreamerV3 WM training, batch 16x16         -> grad-steps/s
  2. process_dataset InternVideo2-1B embedding pass            -> clips/s
  3. GenRL WM+connector pretraining, batch 16x16               -> grad-steps/s
  4. Language-prompt behavior learning, batch 32x32 horizon 16 -> behavior steps/s
  5. Data-free video-prompt RL + t2v decode                    -> steps/s, frames/s

Prints one JSON object per config (stdout) and writes BENCH_ALL.json.
bench.py (the driver contract) stays the single-line config-#3 measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BATCH, LENGTH = 16, 16
BEH_BATCH, BEH_LENGTH = 32, 32
WARMUP, MEASURE = 3, 30

# peak dense matmul throughput per chip, by device_kind prefix
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e bf16
    "TPU v5": 459e12,        # v5p bf16
    "TPU v4": 275e12,
    "cpu": 1e11,
}


def peak_for(device) -> float:
    kind = getattr(device, "device_kind", "cpu")
    for prefix, peak in PEAK_FLOPS.items():
        if kind.startswith(prefix):
            return peak
    return PEAK_FLOPS["cpu"]


def sync(tree):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(jnp.sum(leaf)))  # 4-byte readback through the tunnel


def flops_of(compiled) -> float | None:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", -1.0))
        return f if f > 0 else None
    except Exception:
        return None


def timed(fn_compiled, args_fn, state, n=MEASURE):
    """Run warmup + n steps; state-threading via args_fn(state, i)."""
    for i in range(WARMUP):
        state, out = fn_compiled(*args_fn(state, i))
    sync(out)
    t0 = time.perf_counter()
    for i in range(n):
        state, out = fn_compiled(*args_fn(state, WARMUP + i))
    sync(out)
    return n / (time.perf_counter() - t0), state


def main():
    import jax
    import jax.numpy as jnp

    from genrl_tpu.agents.assembly import GenRLAgent
    from genrl_tpu.configs import TRAIN_BASE
    from genrl_tpu.data.device_replay import DeviceReplay, sample_windows
    from genrl_tpu.parallel import make_mesh, replicated
    from genrl_tpu.utils.config import Config
    from __graft_entry__ import init_on_host

    dev = jax.devices()[0]
    peak = peak_for(dev)
    print(f"device: {dev} peak {peak/1e12:.0f} TFLOPs", file=sys.stderr)
    results = {}

    out_path = Path(os.environ.get("BENCH_ALL_OUT", "BENCH_ALL.json"))
    if out_path.exists():  # merge with a previous partial run
        results.update(json.loads(out_path.read_text()))

    def emit(name, **kv):
        kv = {k: (round(v, 4) if isinstance(v, float) else v) for k, v in kv.items()}
        results[name] = kv
        print(json.dumps({"config": name, **kv}), flush=True)
        out_path.write_text(json.dumps(results, indent=1))  # incremental

    groups = set(os.environ.get("BENCH_ONLY", "agent,iv2").split(","))

    cfg = Config.from_dict(TRAIN_BASE)
    cfg["precision"] = 16
    if "agent" not in groups:
        bench_iv2(emit, peak)
        return
    mesh = make_mesh(data=-1, model=1)
    replay = DeviceReplay("/root/reference/data/stickman_example", LENGTH,
                          sharding=replicated(mesh))
    act_dim = 10
    agent = GenRLAgent(cfg, {"observation": (64, 64, 3)}, act_dim)
    state0 = init_on_host(agent, jax.random.PRNGKey(0))
    base_key = jax.random.PRNGKey(1234)

    def make_step(twm, tconn, target, B, L):
        def fused(s, arrays, ep_len, base, step):
            k1, k2 = jax.random.split(jax.random.fold_in(base, step))
            d = sample_windows(arrays, ep_len, k1, B, L, None)
            return agent.train_step(s, d, k2, target_seq=target,
                                    train_world_model=twm, train_connector=tconn)

        j = jax.jit(fused, donate_argnums=(0,))
        lowered = j.lower(state0, replay.arrays, replay.ep_len, base_key, 0)
        compiled = lowered.compile()
        args = lambda s, i: (s, replay.arrays, replay.ep_len, base_key, i)
        return compiled, args

    # ---- config 1: WM-only ----------------------------------------------------------
    step1, args1 = make_step(True, False, None, BATCH, LENGTH)
    f1 = flops_of(step1)
    sps1, _ = timed(step1, args1, state0)
    emit("1_wm_training", steps_per_sec=sps1,
         flops_per_step=f1, mfu=(sps1 * f1 / peak) if f1 else None,
         note="batch 16x16, stickman fixture, bf16")

    # ---- config 3: WM + connector ---------------------------------------------------
    state0 = init_on_host(agent, jax.random.PRNGKey(0))  # step1 donated it
    step3, args3 = make_step(True, True, None, BATCH, LENGTH)
    f3 = flops_of(step3)
    sps3, _ = timed(step3, args3, state0)
    emit("3_wm_connector_training", steps_per_sec=sps3,
         flops_per_step=f3, mfu=(sps3 * f3 / peak) if f3 else None,
         note="batch 16x16, stickman fixture, bf16 (the bench.py config)")

    # ---- config 3b: WM + connector at reference scale (48x48) -----------------------
    # the reference pretrains at batch_size=48, batch_length=48
    # (conf/defaults/genrl.yaml:30-31); VERDICT r2 asked for this number
    state0 = init_on_host(agent, jax.random.PRNGKey(0))
    step3b, args3b = make_step(True, True, None, 48, 48)
    f3b = flops_of(step3b)
    sps3b, _ = timed(step3b, args3b, state0, n=10)
    emit("3b_wm_connector_48x48", steps_per_sec=sps3b,
         flops_per_step=f3b, mfu=(sps3b * f3b / peak) if f3b else None,
         note="batch 48x48 (reference pretrain scale), stickman fixture, bf16")

    # ---- config 4: behavior learning from language ------------------------------------
    state0 = init_on_host(agent, jax.random.PRNGKey(0))
    prompt = np.random.default_rng(0).normal(size=(512,)).astype(np.float32)
    prompt /= np.linalg.norm(prompt)
    target = agent.make_unconditional_target(
        state0, jnp.asarray(prompt), batch=BEH_BATCH * BEH_LENGTH,
        key=jax.random.PRNGKey(3))
    step4, args4 = make_step(False, False, target, BEH_BATCH, BEH_LENGTH)
    f4 = flops_of(step4)
    sps4, _ = timed(step4, args4, state0)
    hor = int(cfg.imag_horizon)
    emit("4_behavior_language", steps_per_sec=sps4,
         imagined_latent_frames_per_sec=sps4 * BEH_BATCH * BEH_LENGTH * hor,
         flops_per_step=f4, mfu=(sps4 * f4 / peak) if f4 else None,
         note=f"batch {BEH_BATCH}x{BEH_LENGTH}, horizon {hor}, "
              "video_text_reward align_sequence, data observe + imag behavior")

    # ---- config 5: data-free RL + t2v decode ------------------------------------------
    state0 = init_on_host(agent, jax.random.PRNGKey(0))
    j5 = jax.jit(lambda s, t, k: agent.train_step_data_free(
        s, k, t, BEH_BATCH, BEH_LENGTH, "mix", True, 5), donate_argnums=(0,))
    step5 = j5.lower(state0, target, base_key).compile()
    f5 = flops_of(step5)
    keyed = lambda s, i: (s, target, jax.random.fold_in(base_key, i))
    sps5, state5 = timed(step5, keyed, state0)
    emit("5_data_free_rl", steps_per_sec=sps5,
         imagined_latent_frames_per_sec=sps5 * BEH_BATCH * BEH_LENGTH * hor,
         flops_per_step=f5, mfu=(sps5 * f5 / peak) if f5 else None,
         note="batch 32x32, synthetic starts (mix), video-prompt reward")

    # t2v decode: text embed -> connector video_imagine -> decoder pixels
    T = 8 * agent.n_frames

    def t2v(s, emb, k):
        ve = jnp.broadcast_to(emb.reshape(1, 1, -1), (1, T, emb.shape[-1]))
        prior = agent.connector.apply(s.connector_params, ve, k, sample=False,
                                      reset_every_n_frames=True, denoise=True,
                                      method="video_imagine")
        inp = agent.wm.apply(s.wm_params, prior, method="decoder_input")
        return s, agent.wm.apply(s.wm_params, inp, method="decode")["observation"].mean

    jt = jax.jit(t2v)
    step_t2v = jt.lower(state5, jnp.asarray(prompt), base_key).compile()
    fps_t2v, _ = timed(step_t2v, lambda s, i: (s, jnp.asarray(prompt),
                                               jax.random.fold_in(base_key, i)),
                       state5, n=20)
    emit("5b_t2v_decode", videos_per_sec=fps_t2v, frames_per_sec=fps_t2v * T,
         note=f"{T}-frame 64px text-to-video decode (demo/t2v.py path)")

    # ---- config 2: InternVideo2-1B embedding ------------------------------------------
    del state0, state5, step1, step3, step4, step5  # free HBM for the 1B tower
    if "iv2" in groups:
        bench_iv2(emit, peak)


def bench_iv2(emit, peak):
    import jax

    from genrl_tpu.models.clip_wrapper import ViCLIP

    clip = ViCLIP(models_root="/nonexistent", use_flash=True)
    frames = np.random.default_rng(0).integers(
        0, 255, (8, 8, 64, 64, 3), np.uint8)  # 8 clips x 8 frames (fixture res)
    x = clip.preprocess_transf(frames)
    fv = jax.jit(lambda p, f: clip.model.apply(p, f, method="get_vid_features"))
    cv = fv.lower(clip.params, x).compile()
    f2 = flops_of(cv)
    out = cv(clip.params, x)
    sync(out)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        out = cv(clip.params, x)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    clips_per_sec = frames.shape[0] / dt
    emit("2_internvideo2_embed", clips_per_sec=clips_per_sec,
         ms_per_batch8=dt * 1e3, flops_per_batch=f2,
         mfu=(f2 / dt / peak) if f2 else None,
         note="1B ViT bf16 + Pallas flash attention, 8x224p frames/clip")


if __name__ == "__main__":
    main()
