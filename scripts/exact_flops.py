"""EXACT per-grad-step FLOP accounting (VERDICT r4 item 6).

XLA's compiled-HLO cost analysis counts a `lax.scan` body ONCE regardless of
trip count, so every scan inside one grad step (RSSM observe over L,
imagination over the horizon, lambda-return, connector teacher forcing) was
under-counted and BASELINE.md could only report MFU as a lower bound ("MFU
>="). This script removes the inequality: it monkeypatches `jax.lax.scan` to
fully unroll (`unroll=True` -> one trip whose body contains every iteration,
so cost analysis counts all of them) and re-lowers the SAME per-step programs
bench_all.py times, on the host CPU backend — HLO flop counts are a property
of the traced math, not the target chip, and on CPU the Pallas GRU path
lowers to the XLA oracle so its math is counted too.

Exact MFU = measured steps/s (BENCH_ALL.json, real chip) x exact flops/step
/ chip peak. Output: evidence/flops_exact.json + a BASELINE.md-ready table.

Run on CPU only — safe beside a TPU-holding chain:
    python -u scripts/exact_flops.py [configs...]   # default: 1 3 4 5
(3b at 48x48 unrolls a 48-long scan; add '3b' explicitly if you can afford
the ~10 min single-core compile.)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def unrolled_scan_patch():
    orig = jax.lax.scan

    def scan(f, init, xs=None, length=None, reverse=False, unroll=1,
             **kw):
        del unroll
        return orig(f, init, xs, length=length, reverse=reverse,
                    unroll=True, **kw)

    jax.lax.scan = scan
    return orig


def flops_of_lowered(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def synth_batch(rng, B, L, emb=512, act=10, img=64):
    d = {
        "observation": rng.integers(0, 255, (B, L, img, img, 3), np.uint8),
        "action": rng.normal(size=(B, L, act)).astype(np.float32),
        "reward": rng.normal(size=(B, L, 1)).astype(np.float32),
        "is_first": np.zeros((B, L), bool),
        "is_terminal": np.zeros((B, L), bool),
        "discount": np.ones((B, L, 1), np.float32),
        "clip_video": rng.normal(size=(B, L, emb)).astype(np.float32),
    }
    d["is_first"][:, 0] = True
    return d


def main():
    sel = sys.argv[1:] or ["1", "3", "4", "5"]

    from genrl_tpu.agents.assembly import GenRLAgent
    from genrl_tpu.configs import TRAIN_BASE
    from genrl_tpu.utils.config import Config
    from __graft_entry__ import init_on_host

    cfg = Config.from_dict(TRAIN_BASE)
    cfg["precision"] = 16  # same bf16 programs the bench times
    agent = GenRLAgent(cfg, {"observation": (64, 64, 3)}, 10)
    state = init_on_host(agent, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    hor = int(cfg.imag_horizon)

    out_path = Path("evidence/flops_exact.json")
    results = json.loads(out_path.read_text()) if out_path.exists() else {}
    bench = {}
    if Path("BENCH_ALL.json").exists():
        bench = json.loads(Path("BENCH_ALL.json").read_text())
    peak = float(bench.get("_meta", {}).get("peak_tflops", 0)) * 1e12

    def measure(name, build):
        t0 = time.time()
        # exact trace: scans fully unrolled so cost analysis sees every trip
        orig = unrolled_scan_patch()
        try:
            compiled = build().lower(*ARGS[name]).compile()
        finally:
            jax.lax.scan = orig
        exact = flops_of_lowered(compiled)
        row = {"flops_per_step_exact": exact,
               "compile_s": round(time.time() - t0, 1)}
        b = bench.get(BENCH_KEY[name], {})
        if b.get("flops_per_step"):
            row["flops_per_step_lower_bound"] = b["flops_per_step"]
            row["undercount_factor"] = round(exact / b["flops_per_step"], 3)
        if b.get("steps_per_sec") and peak:
            row["steps_per_sec_measured"] = b["steps_per_sec"]
            row["mfu_exact"] = round(b["steps_per_sec"] * exact / peak, 4)
            if b.get("mfu"):
                row["mfu_lower_bound"] = b["mfu"]
        results[name] = row
        print(json.dumps({"config": name, **row}), flush=True)
        results["_meta"] = {
            "method": "jax.lax.scan monkeypatched to unroll=True; one "
                      "grad-step program lowered on the CPU backend; HLO "
                      "cost-analysis flops are trace properties, exact "
                      "once no scan body is collapsed",
            "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime()),
        }
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(json.dumps(results, indent=1))

    data16 = synth_batch(rng, 16, 16)
    data48 = synth_batch(rng, 48, 48)
    data32 = synth_batch(rng, 32, 32)
    target = agent.make_unconditional_target(
        state, jax.numpy.asarray(
            rng.normal(size=(512,)).astype(np.float32)), batch=32 * 32,
        key=jax.random.PRNGKey(3))

    ARGS = {
        "1_wm_16x16": (state, data16, key),
        "3_wm_connector_16x16": (state, data16, key),
        "3b_wm_connector_48x48": (state, data48, key),
        "4_behavior_32x32": (state, data32, key),
        "5_data_free_32x32": (state, target, key),
    }
    BENCH_KEY = {
        "1_wm_16x16": "1_wm_training",
        "3_wm_connector_16x16": "3_wm_connector_training",
        "3b_wm_connector_48x48": "3b_wm_connector_48x48",
        "4_behavior_32x32": "4_behavior_language",
        "5_data_free_32x32": "5_data_free_rl",
    }
    BUILDERS = {
        "1_wm_16x16": lambda: jax.jit(
            lambda s, d, k: agent.train_step(s, d, k, None, True, False)),
        "3_wm_connector_16x16": lambda: jax.jit(
            lambda s, d, k: agent.train_step(s, d, k, None, True, True)),
        "3b_wm_connector_48x48": lambda: jax.jit(
            lambda s, d, k: agent.train_step(s, d, k, None, True, True)),
        "4_behavior_32x32": lambda: jax.jit(
            lambda s, d, k: agent.train_step(s, d, k, target, False, False)),
        "5_data_free_32x32": lambda: jax.jit(
            lambda s, t, k: agent.train_step_data_free(
                s, k, t, 32, 32, "mix", True, 5)),
    }

    name_of = {k.split("_")[0]: k for k in BUILDERS}
    for s in sel:
        name = name_of.get(s, s)
        if name not in BUILDERS:
            print(f"unknown config {s}; have {sorted(name_of)}")
            continue
        measure(name, BUILDERS[name])


if __name__ == "__main__":
    main()
