"""Diagnose the video-prompt alignment reward end-to-end.

The r2 behavior runs optimized the imagined alignment reward (0.27 -> 0.40
over 50k steps) yet stayed at the env random floor — so either the
connector-generated target trajectory does not encode the demonstrated
behavior, or the alignment reward does not rank real task behavior above
random behavior. This script measures both directly, with NO behavior
training in the loop:

  1. Decodes the unconditional target trajectory (video prompt -> IV2 embed
     -> connector video_imagine -> decoder) to a pixel strip: does the
     *target itself* show walking?
  2. Ranking check: computes the exact behavior-learning reward
     (max_cosine + align_sequence over conv_in features) on REAL posterior
     windows from the dataset, and correlates it with the windows' env
     returns. A useful reward must rank high-return (walking) windows above
     low-return (idle/fallen) ones.
  3. A/B of the alignment variants (align_sequence / align_initial / none,
     cosine vs max_cosine) on the same windows.

Runs on the host CPU backend by default: every model here is small (the one
IV2 video-embed forward is ~1 min on CPU), and eager reward math over a
remote-TPU link would pay a round trip per op.

Usage (~5 min, CPU):
    JAX_PLATFORMS=cpu python -u scripts/diagnose_alignment.py \
        --wm evidence/pipeline/wm/stickman_walk \
        --dataset evidence/pipeline/dataset \
        --video evidence/pipeline/prompt_stickman_walk.mp4 \
        --out evidence/diag_alignment
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# force the host CPU backend (the deployment sitecustomize pins a TPU plugin;
# both the env var and the config update are needed, see CLAUDE.md)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def load_state(wm_dir: Path, dataset_dir: Path):
    import jax

    from __graft_entry__ import init_on_host
    from genrl_tpu.agents.assembly import make_agent
    from genrl_tpu.utils.checkpoint import SnapshotManager
    from genrl_tpu.utils.config import Config

    cfg = Config.from_dict(json.loads((wm_dir / "config.json").read_text()))
    ep_path = sorted(dataset_dir.glob("*.npz"))[0]
    with np.load(ep_path) as ep:
        obs = ep["observation"]
        act_dim = ep["action"].shape[-1]
    obs_shape = (obs.shape[2], obs.shape[3], obs.shape[1]) if obs.shape[1] in (1, 3) \
        else tuple(obs.shape[1:])
    agent = make_agent(cfg, {"observation": obs_shape}, act_dim)
    template = init_on_host(agent, jax.random.PRNGKey(0))
    loaded = SnapshotManager(wm_dir / "snapshots").load(
        jax.tree_util.tree_map(np.asarray, template))
    assert loaded is not None, f"no snapshot under {wm_dir}/snapshots"
    state, counters = loaded
    print(f"loaded WM snapshot at step {counters.get('step')}")
    return cfg, agent, state


def episode_windows(dataset_dir: Path, W: int, per_ep: int, seed: int = 0):
    """[N, W, ...] observation/action/is_first windows + per-window returns,
    spanning the dataset's return distribution (best/mid/worst episodes)."""
    rng = np.random.default_rng(seed)
    eps = []
    for f in sorted(dataset_dir.glob("*.npz")):
        with np.load(f) as ep:
            r = float(np.asarray(ep["reward"]).sum())
            eps.append((r, f))
    eps.sort()
    n = len(eps)
    # best/mid/worst strata, clamped + deduped for small datasets (n < 12)
    idx = (list(range(4)) + [n // 2 - 2, n // 2 - 1, n // 2, n // 2 + 1]
           + list(range(n - 4, n)))
    idx = sorted({min(max(i, 0), n - 1) for i in idx})
    picks = [eps[i] for i in idx]
    batch = {"observation": [], "action": [], "is_first": []}
    win_returns, ep_returns = [], []
    for ret, f in picks:
        with np.load(f) as ep:
            obs = np.asarray(ep["observation"])
            if obs.shape[1] in (1, 3):
                obs = obs.transpose(0, 2, 3, 1)
            act = np.asarray(ep["action"], np.float32)
            rew = np.asarray(ep["reward"], np.float64).reshape(-1)
        T = obs.shape[0]
        if T < W:  # episode shorter than the diagnosis window
            continue
        for _ in range(per_ep):
            s = int(rng.integers(0, T - W + 1))
            batch["observation"].append(obs[s:s + W])
            batch["action"].append(act[s:s + W])
            isf = np.zeros(W, bool)
            isf[0] = True
            batch["is_first"].append(isf)
            win_returns.append(rew[s:s + W].sum())
            ep_returns.append(ret)
    data = {k: np.stack(v) for k, v in batch.items()}
    return data, np.asarray(win_returns), np.asarray(ep_returns)


def save_strip(frames: np.ndarray, path: Path, every: int = 2):
    """[T, H, W, C] float in [0,1] -> horizontal PNG strip."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sel = frames[::every]
    strip = np.concatenate(list(sel), axis=1)
    plt.figure(figsize=(len(sel) * 1.2, 1.4), dpi=110)
    plt.imshow(np.clip(strip, 0, 1))
    plt.axis("off")
    plt.tight_layout(pad=0.1)
    path.parent.mkdir(parents=True, exist_ok=True)
    plt.savefig(path)
    plt.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wm", type=Path, required=True)
    ap.add_argument("--dataset", type=Path, required=True)
    ap.add_argument("--video", type=Path, required=True)
    ap.add_argument("--out", type=Path, default=Path("evidence/diag_alignment"))
    ap.add_argument("--window", type=int, default=17)  # imag_horizon + 1
    ap.add_argument("--per-ep", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from genrl_tpu.models.internvideo2 import get_global_instance
    from genrl_tpu.models.rssm import dist_from_stats, swap_bt
    from genrl_tpu.rewards.plugins import aligned_similarity_reward

    cfg, agent, state = load_state(args.wm, args.dataset)
    args.out.mkdir(parents=True, exist_ok=True)
    results = {}

    # ---- 1. the target trajectory, decoded --------------------------------
    clip = get_global_instance(cfg.get("viclip_model", "internvideo2"),
                               models_root=cfg.get("models_root", "models"))
    embed = np.asarray(clip.get_vid_features_from_file(str(args.video)))
    embed = embed.reshape(-1).astype(np.float32)
    embed /= max(np.linalg.norm(embed), 1e-8)
    stats_path = args.wm / "snapshots" / "embed_stats.npz"
    if stats_path.exists():
        # the connector was trained on whitened clip_video (embed_whiten=True)
        # — the prompt must live in the same reparameterized space
        from genrl_tpu.rewards.embed_stats import load_stats, whiten

        embed = whiten(embed, load_stats(args.wm / "snapshots")["mean"])
        print("prompt embed whitened with the run's embed_stats.npz")
    print(f"video prompt embed: norm=1, dim={embed.shape[0]}")

    key = jax.random.PRNGKey(0)
    T_dec = 32

    @jax.jit
    def decode_target(state, emb, key):
        ve = jnp.broadcast_to(emb.reshape(1, 1, -1), (1, T_dec, emb.shape[-1]))
        prior = agent.connector.apply(
            state.connector_params, ve, key, sample=False,
            reset_every_n_frames=False, denoise=True, method="video_imagine")
        inp = agent.wm.apply(state.wm_params, prior, method="decoder_input")
        img = agent.wm.apply(state.wm_params, inp, method="decode")[
            "observation"].mean + 0.5
        return img

    target_vid = np.asarray(decode_target(state, jnp.asarray(embed), key))[0]
    save_strip(target_vid, args.out / "target_decoded.png")
    print(f"decoded target strip -> {args.out / 'target_decoded.png'}")

    # ---- 2+3. posterior windows vs reward variants --------------------------
    data, win_ret, ep_ret = episode_windows(args.dataset, args.window, args.per_ep)
    N = data["observation"].shape[0]
    print(f"{N} posterior windows of length {args.window}")

    @jax.jit
    def posterior_seq(state, data, key):
        p = agent.wm.apply(state.wm_params, {
            "observation": data["observation"], "action": data["action"],
            "is_first": data["is_first"],
            "reward": jnp.zeros(data["action"].shape[:2] + (1,)),
            "is_terminal": jnp.zeros(data["action"].shape[:2], bool),
            "discount": jnp.ones(data["action"].shape[:2] + (1,)),
        }, method="preprocess")
        emb = agent.wm.apply(state.wm_params, p, method="encode")
        post, _ = agent.wm.apply(state.wm_params, emb, p["action"],
                                 p["is_first"], key, method="observe_rssm")
        return post

    post = posterior_seq(state, {k: jnp.asarray(v) for k, v in data.items()},
                         jax.random.PRNGKey(1))
    agent_seq = {k: swap_bt(v) for k, v in post.items()}  # time-major [W, N, ...]

    # the exact behavior-learning target (T=imag_horizon+1, broadcast to N)
    target = agent.make_unconditional_target(
        state, jnp.asarray(embed), batch=N, key=jax.random.PRNGKey(2),
        sample_for_target=False, skip_first_target=True)

    conv_in = lambda x: agent.wm.apply(state.wm_params, x, method="conv_in_features")
    flat = lambda s: (s["stoch"].reshape(s["stoch"].shape[:-2] + (-1,))
                      if agent.discrete else s["stoch"])
    get_dist = lambda s: dist_from_stats(s, agent.discrete)
    variants = {
        "max_cosine+align_sequence": dict(score_fn="max_cosine", align_sequence=True),
        "max_cosine+align_initial": dict(score_fn="max_cosine", align_initial=True),
        "max_cosine+no_align": dict(score_fn="max_cosine"),
        "cosine+align_sequence": dict(score_fn="cosine", align_sequence=True),
        "neg_kl+align_sequence": dict(score_fn="neg_kl", align_sequence=True),
    }

    def reward_of(variant_kw):
        r = aligned_similarity_reward(
            agent_seq, target, n_frames=agent.n_frames, conv_in_fn=conv_in,
            get_stoch_agent=flat, get_stoch_target=flat,
            get_dist_agent=get_dist, get_dist_target=get_dist, **variant_kw)
        return np.asarray(r[..., 0].mean(0))  # [N] mean over time

    order = np.argsort(win_ret)
    lo, hi = order[: N // 3], order[-N // 3:]
    print(f"\nwindow env returns: min={win_ret.min():.1f} "
          f"median={np.median(win_ret):.1f} max={win_ret.max():.1f}")
    for name, kw in variants.items():
        r = reward_of(kw)
        rho = float(np.corrcoef(win_ret, r)[0, 1])
        res = {
            "spearman_vs_return": float(np.corrcoef(
                np.argsort(np.argsort(win_ret)), np.argsort(np.argsort(r)))[0, 1]),
            "pearson_vs_return": rho,
            "mean_low_third": float(r[lo].mean()),
            "mean_high_third": float(r[hi].mean()),
        }
        results[name] = res
        print(f"{name:30s} pearson={rho:+.3f} spearman={res['spearman_vs_return']:+.3f} "
              f"low3={res['mean_low_third']:+.4f} high3={res['mean_high_third']:+.4f}")

    # decode best + worst windows for visual reference
    best_i, worst_i = int(order[-1]), int(order[0])
    save_strip(data["observation"][best_i].astype(np.float32) / 255.0,
               args.out / "best_window_pixels.png")
    save_strip(data["observation"][worst_i].astype(np.float32) / 255.0,
               args.out / "worst_window_pixels.png")

    (args.out / "results.json").write_text(json.dumps({
        "window_returns": {"min": float(win_ret.min()), "max": float(win_ret.max()),
                           "median": float(np.median(win_ret))},
        "variants": results,
    }, indent=2))
    print(f"\nresults -> {args.out / 'results.json'}")


if __name__ == "__main__":
    main()
