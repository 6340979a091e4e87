"""Measure which alignment-reward config actually ranks real behavior, and
its real-window ceiling, BEFORE burning chip-hours on behavior training.

Round 4b's behavior run optimized its alignment reward (0.203 -> 0.321) while
env score stayed at the random floor — the reward config (align_initial, no
score_clip, pose cosine) was chosen by a CLIP-space diagnosis that does not
transfer to posterior-latent space (evidence/pipeline/README.md, r5 fix
list). This script measures, in the EXACT reward space behavior training will
use (posterior latents of the trained WM + decoder conv_in features):

  1. spearman(window alignment reward, window env return) over real dataset
     windows — does the reward rank competent behavior above junk?
  2. the reward distribution over real windows (p50/p95/max) — the ceiling
     real behavior attains, i.e. where score_clip must sit so adversarial
     imagination has no gradient incentive to leave the data manifold.

for each candidate (align variant x score_fn) config, and recommends the
spearman-argmax config + its p95 ceiling. The r5 chain consumes the JSON.

Usage:
  python -u scripts/diag_posterior_reward.py <wm_workdir>/<task> \
      <dataset_dir> <demo_npz> [out_json]

Reference context: tools/genrl_utils.py:325-366 (alignment),
agent/genrl.py:108-124 (behavior update consuming the reward).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("DIAG_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


CANDIDATES = [
    # (name, align_initial, align_sequence, score_fn, score_from)
    # score_from="mean" scores expected stoch (softmax probs) instead of the
    # per-step sample — sampled-feature deltas are mostly categorical noise
    # (measured on the toy treadmill, tests/test_env_return_transfer.py)
    ("init_max_cosine", True, False, "max_cosine", "sample"),  # r4b control
    ("init_max_cos_mean", True, False, "max_cosine", "mean"),
    ("init_delta_max_mean", True, False, "delta_max_cosine", "mean"),
    ("seq_max_cosine", False, True, "max_cosine", "sample"),
    ("seq_max_cos_mean", False, True, "max_cosine", "mean"),
    ("seq_delta_max", False, True, "delta_max_cosine", "sample"),
    ("seq_delta_max_mean", False, True, "delta_max_cosine", "mean"),
    ("plain_delta_max_mean", False, False, "delta_max_cosine", "mean"),
]


def spearman(a: np.ndarray, b: np.ndarray) -> float:
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    d = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / d) if d > 0 else 0.0


def main():
    workdir = Path(sys.argv[1])
    dataset = Path(sys.argv[2])
    demo_npz = sys.argv[3]
    out_path = Path(sys.argv[4]) if len(sys.argv) > 4 else workdir / "diag_reward.json"

    import jax
    import jax.numpy as jnp

    from genrl_tpu.agents.assembly import make_agent
    from genrl_tpu.data.device_replay import DeviceReplay, sample_windows
    from genrl_tpu.models.rssm import swap_bt
    from genrl_tpu.utils.checkpoint import SnapshotManager
    from genrl_tpu.utils.config import Config
    from genrl_tpu.utils.demo import load_demo_window
    from __graft_entry__ import init_on_host

    cfg = Config.from_dict(json.loads((workdir / "config.json").read_text()))
    hor = int(cfg.imag_horizon)
    L = hor + 1  # real windows exactly the imag-rollout length
    B = int(os.environ.get("DIAG_B", 48))
    K = int(os.environ.get("DIAG_K", 8))

    replay = DeviceReplay(str(dataset), L, load_recursive=True)
    print(f"replay: {replay.stats}", flush=True)

    agent = make_agent(cfg, {"observation": (64, 64, 3)}, 10)
    template = init_on_host(agent, jax.random.PRNGKey(int(cfg.seed)))
    state, counters = SnapshotManager(workdir / "snapshots").load(template)
    print(f"loaded WM snapshot at step {counters.get('step')}", flush=True)

    demo = load_demo_window(demo_npz, L)
    target = agent.make_posterior_target(
        state, {k: jnp.asarray(v) for k, v in demo.items()},
        batch=B, key=jax.random.PRNGKey(int(cfg.seed) + 99))

    # one shared posterior pass per batch; per-config scoring reuses it
    @jax.jit
    def posterior_windows(s, k):
        d = sample_windows(replay.arrays, replay.ep_len, k, B, L)
        outs, _ = agent.observe_data(s, d, jax.random.fold_in(k, 1))
        seq = {k2: swap_bt(v) for k2, v in outs["post"].items()}
        seq["feat"] = agent.wm.apply(s.wm_params, seq, method="get_feat")
        ret = jnp.sum(d["reward"][..., 0], axis=1)  # [B] window env return
        return seq, ret

    seqs, rets = [], []
    for i in range(K):
        seq, ret = posterior_windows(state, jax.random.PRNGKey(1000 + i))
        seqs.append(jax.tree_util.tree_map(np.asarray, seq))
        rets.append(np.asarray(ret))
    env_ret = np.concatenate(rets)  # [K*B]
    print(f"window env return: mean {env_ret.mean():.2f} "
          f"p95 {np.percentile(env_ret, 95):.2f} max {env_ret.max():.2f}",
          flush=True)

    results = {}
    for name, a_init, a_seq, score_fn, score_from in CANDIDATES:
        agent.agent_cfg.imag_reward_args.update(dict(
            align_initial=a_init, align_sequence=a_seq, score_fn=score_fn,
            score_from=score_from, score_clip=None))
        reward_fn = agent._imag_reward_fn(state, target)
        score = jax.jit(lambda seq: jnp.mean(reward_fn(seq)[..., 0], axis=0))
        vals = np.concatenate([np.asarray(score(s)) for s in seqs])  # [K*B]
        results[name] = {
            "spearman_vs_env_return": spearman(vals, env_ret),
            "reward_mean": float(vals.mean()),
            "reward_p50": float(np.percentile(vals, 50)),
            "reward_p95": float(np.percentile(vals, 95)),
            "reward_max": float(vals.max()),
        }
        print(f"{name:18s} spearman={results[name]['spearman_vs_env_return']:+.3f} "
              f"p95={results[name]['reward_p95']:.4f} "
              f"max={results[name]['reward_max']:.4f}", flush=True)

    best = max(results, key=lambda n: results[n]["spearman_vs_env_return"])
    cand = {c[0]: c[1:] for c in CANDIDATES}[best]
    out = {
        "n_windows": int(env_ret.size),
        "env_return_mean": float(env_ret.mean()),
        "configs": results,
        "best": best,
        "best_args": {"align_initial": cand[0], "align_sequence": cand[1],
                      "score_fn": cand[2], "score_from": cand[3]},
        "score_clip": results[best]["reward_p95"],
    }
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(out, indent=1))
    print(f"best={best} score_clip={out['score_clip']:.4f} -> {out_path}",
          flush=True)


if __name__ == "__main__":
    main()
