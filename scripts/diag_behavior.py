"""Diagnose a trained imagination behavior: real learning vs reward hacking.

The imag policy maximizes a latent alignment reward (video_video_reward /
video_text_reward). If the imagined trajectories leave the data manifold,
alignment can rise while the env score stays at the random floor. This script
quantifies that from a behavior workdir:

  1. trained-policy imagination reward  vs  random-policy imagination reward
     (same program, different actor params),
  2. the alignment reward of REAL dataset windows (posterior latents) — the
     scale real behavior achieves,
  3. decoded pixel strips of (a) trained-policy imagination, (b) the target
     trajectory, so the claimed behavior is visible.

Trained >> real-window ceiling with degenerate decoded frames => hacking.
Trained ~ real-window scale with walking-like frames => genuine transfer and
the gap is the WM/env mismatch.

Usage:
  python -u scripts/diag_behavior.py evidence/pipeline/beh_r4/stickman_walk \
      [dataset_dir] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("DIAG_CPU"):
    # run on the host CPU backend (e.g. while the single-client TPU is held
    # by a training chain); both steps are required, see CLAUDE.md
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    workdir = Path(sys.argv[1] if len(sys.argv) > 1 else
                   "evidence/pipeline/beh_r4/stickman_walk")
    dataset = Path(sys.argv[2] if len(sys.argv) > 2 else
                   "evidence/pipeline/dataset")
    out_dir = Path(sys.argv[3] if len(sys.argv) > 3 else workdir / "diag")
    out_dir.mkdir(parents=True, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from genrl_tpu.agents.assembly import make_agent
    from genrl_tpu.data.device_replay import DeviceReplay, sample_windows
    from genrl_tpu.models.rssm import swap_bt
    from genrl_tpu.rewards import embed_stats as es
    from genrl_tpu.rewards import resolve_reward
    from genrl_tpu.utils.checkpoint import SnapshotManager
    from genrl_tpu.utils.config import Config
    from __graft_entry__ import init_on_host

    import os

    cfg = Config.from_dict(json.loads((workdir / "config.json").read_text()))
    task = cfg.task
    B = int(os.environ.get("DIAG_B", cfg.batch_size))
    L = int(os.environ.get("DIAG_L", cfg.batch_length))

    # ---- whitening stats + replay (same space as the training run) ---------
    mean = es.load_stats(workdir / "snapshots")["mean"]
    transforms = {"clip_video": lambda x: es.whiten(x, mean)}
    replay = DeviceReplay(str(dataset), L, load_recursive=True,
                          transforms=transforms)
    print(f"replay: {replay.stats}", flush=True)

    agent = make_agent(cfg, {"observation": (64, 64, 3)}, 10)
    template = init_on_host(agent, jax.random.PRNGKey(int(cfg.seed)))
    state, counters = SnapshotManager(workdir / "snapshots").load(template)
    print(f"loaded behavior snapshot at step {counters.get('step')}", flush=True)

    # ---- target (identical construction to train.py's behavior phase) ------
    args = dict(cfg.agent.imag_reward_args)
    key = jax.random.PRNGKey(int(cfg.seed) + 99)
    if args.get("target_from", "connector") == "posterior":
        # demonstration route: the SAME demo window + WM posterior encoding
        # the policy trained against (GenRLAgent.make_posterior_target)
        from genrl_tpu.utils.demo import load_demo_window

        path = cfg.get("demo_npz") or str(
            Path(cfg.get("task_video", "")).with_suffix(".npz"))
        demo = load_demo_window(path, int(cfg.imag_horizon) + 1)
        target = agent.make_posterior_target(
            state, {k2: jnp.asarray(v) for k2, v in demo.items()},
            batch=B * L, key=key)
    else:
        spec = resolve_reward(cfg.agent.imag_reward_fn)
        from genrl_tpu.models.internvideo2 import get_global_instance
        clip = get_global_instance(cfg.get("viclip_model", "internvideo2"),
                                   models_root=cfg.get("models_root", "models"))
        emb = spec.prompt_embed(clip, cfg, task)
        emb = es.whiten(np.asarray(emb).reshape(-1), mean)
        target = agent.make_unconditional_target(
            state, jnp.asarray(emb), batch=B * L, key=key,
            sample_for_target=bool(args.get("sample_for_target", False)),
            skip_first_target=bool(args.get("skip_first_target", True)))
    reward_fn = agent._imag_reward_fn(state, target)
    hor = int(agent.agent_cfg.imag_horizon)

    # ---- one batch of posterior starts --------------------------------------
    k_gather, k_obs, k_img, k_img2 = jax.random.split(jax.random.PRNGKey(7), 4)

    @jax.jit
    def observe(s, arrays, ep_len):
        d = sample_windows(arrays, ep_len, k_gather, B, L)
        outs, _ = agent.observe_data(s, d, k_obs)
        return outs["post"], d

    post, batch = observe(state, replay.arrays, replay.ep_len)

    # ---- imagination rollout + reward, actor params as an argument ----------
    def rollout(s, actor_params, k):
        policy = lambda feat: agent.imag.actor.apply(actor_params, feat)
        seq = agent.wm.apply(s.wm_params, policy, post, None, hor, k,
                             method="imagine")
        reward = reward_fn(seq)  # [T, B*L, 1]
        dec_in = agent.wm.apply(
            s.wm_params, {k2: seq[k2][:, :4] for k2 in ("stoch", "deter", "logit")
                          if k2 in seq}, method="decoder_input")
        frames = agent.wm.apply(s.wm_params, dec_in,
                                method="decode")["observation"].mean + 0.5
        return jnp.mean(reward), reward, frames

    jrollout = jax.jit(rollout)
    r_trained, rew_tr, frames_tr = jrollout(state, state.imag.actor_params, k_img)
    random_actor = agent.imag.init_state(jax.random.PRNGKey(123)).actor_params
    r_random, _, _ = jrollout(state, random_actor, k_img2)

    # ---- real-window alignment (posterior latents of dataset windows) -------
    # the behavior target was broadcast to B*L columns; real windows are B
    target_b = {k2: v[:, :B] for k2, v in target.items()}
    real_reward_fn = agent._imag_reward_fn(state, target_b)

    @jax.jit
    def real_reward(s, po):
        seq = {k2: swap_bt(v) for k2, v in po.items()}  # -> [T=L, B]
        seq["feat"] = agent.wm.apply(s.wm_params, seq, method="get_feat")
        return jnp.mean(real_reward_fn(seq))

    r_real = real_reward(state, post)

    # ---- target decode -------------------------------------------------------
    @jax.jit
    def decode_target(s):
        t1 = {k2: v[:, :1] for k2, v in target.items()}  # [T, 1, ...]
        dec_in = agent.wm.apply(s.wm_params, t1, method="decoder_input")
        return agent.wm.apply(s.wm_params, dec_in,
                              method="decode")["observation"].mean + 0.5

    frames_tgt = decode_target(state)

    out = {
        "step": int(counters.get("step", -1)),
        "trained_policy_imag_reward": float(r_trained),
        "random_policy_imag_reward": float(r_random),
        "real_window_reward": float(r_real),
        "hacking_ratio_trained_over_real": float(r_trained) / max(float(r_real), 1e-6),
        "note": "trained >> real with degenerate frames => reward hacking; "
                "trained ~ real scale => genuine alignment transfer",
    }
    print(json.dumps(out, indent=1), flush=True)
    (out_dir / "results.json").write_text(json.dumps(out, indent=1))

    import cv2

    def strip(frames_thw):  # [T, H, W, C] float -> horizontal strip uint8 BGR
        f = np.clip(np.asarray(frames_thw), 0, 1)
        row = np.concatenate(list(f[:: max(1, len(f) // 16)]), axis=1)
        return (row[..., ::-1] * 255).astype(np.uint8)

    ft = np.asarray(frames_tr)  # [T, 4, H, W, C]
    rows = [strip(ft[:, i]) for i in range(ft.shape[1])]
    cv2.imwrite(str(out_dir / "imagined_policy.png"), np.concatenate(rows, 0))
    cv2.imwrite(str(out_dir / "target_decoded.png"),
                strip(np.asarray(frames_tgt)[:, 0]))
    truth = np.asarray(batch["observation"][:2]).astype(np.float32) / 255.0
    cv2.imwrite(str(out_dir / "real_windows.png"),
                np.concatenate([strip(truth[i]) for i in range(2)], 0))
    print(f"wrote {out_dir}/{{results.json,imagined_policy.png,"
          f"target_decoded.png,real_windows.png}}", flush=True)


if __name__ == "__main__":
    main()
