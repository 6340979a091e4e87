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
# grad steps per dispatched program — the production dispatch shape shared
# with train.py (steps_per_dispatch) and bench.py (CHUNK): one prologue
# window-gather per chunk and metrics only on the chunk's last step
CHUNK = 10

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


# XLA's cost analysis counts a lax.scan body ONCE, not trip-count times
# (verified: flops(scan(body, K=10)) == 1.000002 x flops(body)). A
# fused_chunk program is scan(body, CHUNK-1) + one unrolled final step, so
# its reported flops ~= 2 x one grad step (the prologue window gather is
# flop-free; the final step's extra metric reductions are noise). Dividing
# by CHUNK (as rounds 2-4a did) understates flops/step and MFU by CHUNK/2.
CHUNK_FLOPS_STEPS = 2.0
FLOPS_CAVEAT = ("flops from compiled-HLO cost analysis; lax.scan bodies "
                "INSIDE one grad step (RSSM over L, imagination over "
                "horizon) are also counted once, so flops/step and MFU "
                "are LOWER BOUNDS")


def chunk_step_flops(f_chunk: float | None) -> float | None:
    """Per-grad-step flops of a fused_chunk executable (see note above)."""
    return (f_chunk / CHUNK_FLOPS_STEPS) if f_chunk else None


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
    from genrl_tpu.data.device_replay import DeviceReplay, fused_chunk
    from genrl_tpu.parallel import make_mesh, replicated
    from genrl_tpu.utils.config import Config
    from __graft_entry__ import init_on_host

    dev = jax.devices()[0]
    peak = peak_for(dev)
    print(f"device: {dev} peak {peak/1e12:.0f} TFLOPs", file=sys.stderr)
    results = {}

    out_path = Path(os.environ.get("BENCH_ALL_OUT", "BENCH_ALL.json"))
    # Merge into an existing file ONLY for a selective refresh
    # (BENCH_CONFIGS/BENCH_MERGE) — a full run starts fresh so the table is
    # internally coherent (one chip, one code rev, one sitting; VERDICT r3
    # found a stale round-2 file contradicting bench.py)
    if out_path.exists() and (os.environ.get("BENCH_CONFIGS")
                              or os.environ.get("BENCH_MERGE")):
        results.update(json.loads(out_path.read_text()))
    results["_meta"] = {
        "device": str(dev), "device_kind": getattr(dev, "device_kind", "?"),
        "peak_tflops": peak / 1e12,
        "flops_accounting": FLOPS_CAVEAT,
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }

    def emit(name, **kv):
        kv = {k: (round(v, 4) if isinstance(v, float) else v) for k, v in kv.items()}
        results[name] = kv
        print(json.dumps({"config": name, **kv}), flush=True)
        out_path.write_text(json.dumps(results, indent=1))  # incremental

    groups = set(os.environ.get("BENCH_ONLY", "agent,iv2").split(","))
    # BENCH_CONFIGS="3,3b" refreshes just those configs, merging into the
    # existing BENCH_ALL.json (each emit() writes incrementally)
    sel = os.environ.get("BENCH_CONFIGS")
    want = lambda name: sel is None or any(
        name.split("_")[0] == p.strip() for p in sel.split(","))

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
        # the SAME dispatch body train.py executes (device_replay.fused_chunk:
        # one prologue gather of all CHUNK windows, metrics only on the last
        # step) — each timed call is CHUNK grad steps; timed() results are
        # rescaled by the caller
        agent_step = lambda s, d, k: agent.train_step(
            s, d, k, target_seq=target,
            train_world_model=twm, train_connector=tconn)
        chunk = fused_chunk(agent_step, CHUNK, B, L, base_key,
                            jax.random.PRNGKey(5678))
        j = jax.jit(chunk, donate_argnums=(0,))
        lowered = j.lower(state0, 0, replay.arrays, replay.ep_len)
        compiled = lowered.compile()
        args = lambda s, i: (s, i * CHUNK, replay.arrays, replay.ep_len)
        return compiled, args

    # ---- config 1: WM-only ----------------------------------------------------------
    if want("1_wm_training"):
        step1, args1 = make_step(True, False, None, BATCH, LENGTH)
        f1 = flops_of(step1)
        n1, _ = timed(step1, args1, state0)
        sps1 = n1 * CHUNK
        fs1 = chunk_step_flops(f1)
        emit("1_wm_training", steps_per_sec=sps1,
             flops_per_step=fs1,
             mfu=(sps1 * fs1 / peak) if fs1 else None,
             note=f"batch 16x16, stickman fixture, bf16, {CHUNK}-step dispatch")

    # ---- config 3: WM + connector ---------------------------------------------------
    if want("3_wm_connector_training"):
        state0 = init_on_host(agent, jax.random.PRNGKey(0))  # 1 donated it
        step3, args3 = make_step(True, True, None, BATCH, LENGTH)
        f3 = flops_of(step3)
        n3, _ = timed(step3, args3, state0)
        sps3 = n3 * CHUNK
        fs3 = chunk_step_flops(f3)
        emit("3_wm_connector_training", steps_per_sec=sps3,
             flops_per_step=fs3,
             mfu=(sps3 * fs3 / peak) if fs3 else None,
             note="batch 16x16, stickman fixture, bf16, "
                  f"{CHUNK}-step dispatch (the bench.py config)")

    # ---- config 3b: WM + connector at reference scale (48x48) -----------------------
    # the reference pretrains at batch_size=48, batch_length=48
    # (conf/defaults/genrl.yaml:30-31); VERDICT r2 asked for this number
    if want("3b_wm_connector_48x48"):
        state0 = init_on_host(agent, jax.random.PRNGKey(0))
        step3b, args3b = make_step(True, True, None, 48, 48)
        f3b = flops_of(step3b)
        n3b, _ = timed(step3b, args3b, state0, n=3)
        sps3b = n3b * CHUNK
        fs3b = chunk_step_flops(f3b)
        emit("3b_wm_connector_48x48", steps_per_sec=sps3b,
             flops_per_step=fs3b,
             mfu=(sps3b * fs3b / peak) if fs3b else None,
             note="batch 48x48 (reference pretrain scale), stickman fixture, "
                  f"bf16, {CHUNK}-step dispatch")

    # ---- config 4: behavior learning from language ------------------------------------
    prompt = np.random.default_rng(0).normal(size=(512,)).astype(np.float32)
    prompt /= np.linalg.norm(prompt)
    hor = int(cfg.imag_horizon)
    need_target = (want("4_behavior_language") or want("5_data_free_rl")
                   or want("5b_t2v_decode"))
    if need_target:
        state0 = init_on_host(agent, jax.random.PRNGKey(0))
        target = agent.make_unconditional_target(
            state0, jnp.asarray(prompt), batch=BEH_BATCH * BEH_LENGTH,
            key=jax.random.PRNGKey(3))
    if want("4_behavior_language"):
        step4, args4 = make_step(False, False, target, BEH_BATCH, BEH_LENGTH)
        f4 = flops_of(step4)
        n4, _ = timed(step4, args4, state0)
        sps4 = n4 * CHUNK
        fs4 = chunk_step_flops(f4)
        emit("4_behavior_language", steps_per_sec=sps4,
             imagined_latent_frames_per_sec=sps4 * BEH_BATCH * BEH_LENGTH * hor,
             flops_per_step=fs4,
             mfu=(sps4 * fs4 / peak) if fs4 else None,
             note=f"batch {BEH_BATCH}x{BEH_LENGTH}, horizon {hor}, "
                  "video_text_reward align_sequence, data observe + imag "
                  f"behavior, {CHUNK}-step dispatch")

    if not want("5_data_free_rl") and not want("5b_t2v_decode"):
        if "iv2" in groups:
            # drop live refs so XLA frees HBM for the 1B tower, mirroring the
            # end-of-main cleanup (a selective run keeping 1/3/3b/4 alive can
            # otherwise OOM the InternVideo2 bench)
            state0 = target = None
            step1 = step3 = step3b = step4 = None  # noqa: F841
            bench_iv2(emit, peak)
        return

    # ---- config 5: data-free RL + t2v decode ------------------------------------------
    state0 = init_on_host(agent, jax.random.PRNGKey(0))
    j5 = jax.jit(lambda s, t, k: agent.train_step_data_free(
        s, k, t, BEH_BATCH, BEH_LENGTH, "mix", True, 5), donate_argnums=(0,))
    step5 = j5.lower(state0, target, base_key).compile()
    f5 = flops_of(step5)
    keyed = lambda s, i: (s, target, jax.random.fold_in(base_key, i))
    sps5, state5 = timed(step5, keyed, state0)
    # step5/state5 must run even for a 5b-only selection (t2v decodes from
    # state5), but only emit what was asked for — an unguarded emit would
    # overwrite the stored result of the config the user did NOT refresh
    if want("5_data_free_rl"):
        emit("5_data_free_rl", steps_per_sec=sps5,
             imagined_latent_frames_per_sec=sps5 * BEH_BATCH * BEH_LENGTH * hor,
             flops_per_step=f5, mfu=(sps5 * f5 / peak) if f5 else None,
             note="batch 32x32, synthetic starts (mix), video-prompt reward")

    # t2v decode: text embed -> connector video_imagine -> decoder pixels
    if not want("5b_t2v_decode"):
        state0 = state5 = target = None
        step5 = None  # noqa: F841
        if "iv2" in groups:
            bench_iv2(emit, peak)
        return
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
    # drop refs so XLA frees HBM for the 1B tower (plain assignment — del
    # would NameError on names skipped by a BENCH_CONFIGS selection)
    state0 = state5 = target = None
    step1 = step3 = step3b = step4 = step5 = step_t2v = None  # noqa: F841
    if "iv2" in groups:
        bench_iv2(emit, peak)


def bench_iv2(emit, peak):
    import jax

    from genrl_tpu.models.clip_wrapper import ViCLIP

    clip = ViCLIP(models_root="/nonexistent", use_flash=True, random_ok=True)
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
