"""Isolate the per-phase device cost of the WM+connector train step.

VERDICT r3 weak #2: WM-training MFU is ~13-17% and the post-fused-chunk
bottleneck is unknown. This script times each sub-phase of the config-#3
step (BASELINE.md) in isolation on the real chip — fwd+bwd per component,
optimizer apply, GRU rollout kernel vs XLA scan — so the next optimization
targets the measured bottleneck instead of a guess.

Usage (TPU must be free — single-client):
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python -u scripts/profile_phases.py
  PROF_ONLY=enc,dec,gru python -u scripts/profile_phases.py   # subset

Prints one JSON line per phase: {phase, ms, flops, tflops_s, mfu}.

KNOWN-UNRELIABLE over the axon tunnel (measured round 5,
runs/profile_phases_r5.log): per-phase wall timings come out 30-1000x the
plausible device time (e.g. optimizer_apply 6.3 s at 16x16) — the host
readback used to sync each sample pays a tunnel RTT per iteration that
swamps sub-ms device work, and phases cannot be disentangled from it at
this granularity. Use the jax.profiler trace instead (the round-2
breakdown in BASELINE.md came from evidence/wm50k/.../profile via
scripts/profile_summary.py); this script's numbers are only meaningful on
locally-attached devices.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = int(os.environ.get("PROF_B", 16))
L = int(os.environ.get("PROF_L", 16))
WARMUP, N = 3, int(os.environ.get("PROF_N", 20))


def sync(tree):
    import jax
    import jax.numpy as jnp

    leaf = [x for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "dtype")][0]
    return float(np.asarray(jnp.sum(leaf)))  # 4-byte readback (tunnel-safe)


def flops_of(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", -1.0))
        return f if f > 0 else None
    except Exception:
        return None


def main():
    import jax
    import jax.numpy as jnp

    from genrl_tpu.agents.assembly import GenRLAgent
    from genrl_tpu.configs import TRAIN_BASE
    from genrl_tpu.utils.config import Config
    from scripts.bench_all import peak_for
    from __graft_entry__ import init_on_host

    dev = jax.devices()[0]
    peak = peak_for(dev)
    print(f"device: {dev} peak {peak/1e12:.0f} TFLOPs", file=sys.stderr)

    cfg = Config.from_dict(TRAIN_BASE)
    cfg["precision"] = 16
    agent = GenRLAgent(cfg, {"observation": (64, 64, 3)}, 10)
    state = init_on_host(agent, jax.random.PRNGKey(0))
    wm, params = agent.wm, state.wm_params
    key = jax.random.PRNGKey(7)

    rng = np.random.default_rng(0)
    data = {
        "observation": jnp.asarray(rng.integers(0, 255, (B, L, 64, 64, 3), np.uint8)),
        "action": jnp.asarray(rng.normal(size=(B, L, 10)).astype(np.float32)),
        "reward": jnp.asarray(rng.normal(size=(B, L, 1)).astype(np.float32)),
        "is_first": jnp.zeros((B, L), bool),
        "is_terminal": jnp.zeros((B, L), bool),
        "discount": jnp.ones((B, L, 1), jnp.float32),
        "clip_video": jnp.asarray(rng.normal(size=(B, L, 512)).astype(np.float32)),
    }
    embed_dim = agent.wm.apply(params, data, method="encode").shape[-1]
    feat_size = agent.feat_size
    deter = int(cfg.rssm.deter)

    only = os.environ.get("PROF_ONLY")
    want = lambda name: only is None or any(
        name.startswith(p.strip()) for p in only.split(","))

    results = {}

    def bench(name, fn, *args, n=N):
        if not want(name):
            return
        j = jax.jit(fn)
        compiled = j.lower(*args).compile()
        f = flops_of(compiled)
        out = compiled(*args)
        for _ in range(WARMUP - 1):
            out = compiled(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = compiled(*args)
        sync(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        row = {"phase": name, "ms": round(ms, 4),
               "flops": f,
               "tflops_s": round(f / (ms / 1e3) / 1e12, 2) if f else None,
               "mfu": round(f / (ms / 1e3) / peak, 4) if f else None}
        results[name] = row
        print(json.dumps(row), flush=True)

    # ---- 1. encoder fwd+bwd ------------------------------------------------
    def enc_loss(p, d):
        return jnp.sum(wm.apply(p, wm.apply(p, d, method="preprocess"),
                                method="encode").astype(jnp.float32) ** 2)

    bench("enc_fwdbwd", lambda p, d: jax.grad(enc_loss)(p, d), params, data)

    # ---- 2. decoder fwd+bwd (image branch; MSE log_prob like the loss) -----
    feat = jnp.asarray(rng.normal(size=(B, L, wm.apply(
        params, method="decoder_input_size"))).astype(np.float32))
    target_img = jnp.asarray(
        rng.normal(size=(B, L, 64, 64, 3)).astype(np.float32))

    def dec_loss(p, x, t):
        dist = wm.apply(p, x, method="decode")["observation"]
        return -jnp.mean(dist.log_prob(t))

    bench("dec_fwdbwd", lambda p, x, t: jax.grad(dec_loss)(p, x, t),
          params, feat, target_img)

    # ---- 3. RSSM observe fwd+bwd (posterior+prior stats, GRU rollout, KL) --
    embed = jnp.asarray(rng.normal(size=(B, L, embed_dim)).astype(np.float32))

    def rssm_loss(p, e, a, f, k):
        post, prior = wm.apply(p, e, a, f, k, method="observe_rssm")
        kl, _ = wm.apply(p, post, prior, method=lambda m, po, pr: m.rssm.kl_loss(
            po, pr, **dict(m.kl_cfg)))
        return kl + 0.0 * jnp.sum(wm.apply(p, post, method="get_feat"))

    bench("rssm_observe_fwdbwd",
          lambda p, e, a, f, k: jax.grad(rssm_loss)(p, e, a, f, k),
          params, embed, data["action"], data["is_first"], key)

    # ---- 4. GRU rollout alone: Pallas kernel vs XLA scan, fwd+bwd ----------
    x_proj = jnp.asarray(rng.normal(size=(L, B, 3 * deter)).astype(np.float32))
    mask = jnp.ones((L, B), jnp.float32)
    d0 = jnp.zeros((B, deter), jnp.float32)

    def gru_loss(p, xp, m, dd, use_pallas):
        out = wm.apply(p, xp, m, dd, method=lambda mod, a1, a2, a3:
                       mod.rssm.cell.step_seq(a1, a2, a3, use_pallas=use_pallas))
        return jnp.sum(out.astype(jnp.float32) ** 2)

    bench("gru_pallas_fwdbwd",
          lambda p, xp, m, dd: jax.grad(gru_loss)(p, xp, m, dd, True),
          params, x_proj, mask, d0)
    bench("gru_xla_fwdbwd",
          lambda p, xp, m, dd: jax.grad(gru_loss)(p, xp, m, dd, False),
          params, x_proj, mask, d0)

    # ---- 5. optimizer apply (wm-sized grads) --------------------------------
    from genrl_tpu.utils.optim import apply_updates_with_metrics

    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    def opt_apply(g, o, p):
        np_, no_, mets = apply_updates_with_metrics(agent.wm_tx, g, o, p, "model")
        return np_, no_, mets

    bench("optimizer_apply", opt_apply, grads, state.wm_opt, params)

    # ---- 6. connector update fwd+bwd ----------------------------------------
    post = {
        "stoch": jnp.asarray(rng.normal(size=(B, L, 32, 32)).astype(np.float32)),
        "logit": jnp.asarray(rng.normal(size=(B, L, 32, 32)).astype(np.float32)),
        "deter": jnp.asarray(rng.normal(size=(B, L, deter)).astype(np.float32)),
    }

    def conn_loss(cp, d, po, k):
        loss, _ = agent.connector.apply(cp, d["clip_video"].astype(jnp.float32),
                                        po, k, method="update")
        return loss

    bench("connector_fwdbwd",
          lambda cp, d, po, k: jax.grad(conn_loss)(cp, d, po, k),
          state.connector_params, data, post, key)

    # ---- 7. full single train steps (config 1 / config 3 bodies) -----------
    def step1(s, d, k):
        s2, m = agent.train_step(s, d, k, train_world_model=True,
                                 train_connector=False)
        return s2.wm_params, m

    def step3(s, d, k):
        s2, m = agent.train_step(s, d, k, train_world_model=True,
                                 train_connector=True)
        return s2.wm_params, m

    bench("full_step_wm_only", step1, state, data, key, n=10)
    bench("full_step_wm_connector", step3, state, data, key, n=10)

    out_path = Path("runs/profile_phases.json")
    out_path.write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
