"""Driver-artifact smoke: bench.py's exact fused_chunk path must run
end-to-end (imports, config, device replay, jitted chunk, JSON line).

The driver executes `python bench.py` unattended at the end of every round;
this test drives the same module at tiny scale on the CPU mesh so a refactor
can never break the benchmark in a way only discovered on real hardware.
"""

import pytest
import importlib
import json

import numpy as np

TINY = (
    "rssm.hidden=32 rssm.deter=32 rssm.stoch=4 rssm.discrete=4 "
    "encoder.cnn_depth=8 decoder.cnn_depth=8 "
    "reward_head.layers=2 reward_head.units=32 "
    "discount_head.layers=2 discount_head.units=32 "
    "actor.layers=2 actor.units=32 critic.layers=2 critic.units=32 "
    "agent.connector_rssm.hidden=32 agent.connector_rssm.deter=32 "
    "agent.connector_rssm.stoch=4 agent.connector_rssm.discrete=4 "
    "batch_size=4 batch_length=8 precision=32"
)


@pytest.mark.slow
def test_bench_main_smoke(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_OVERRIDES", TINY)
    monkeypatch.setenv("BENCH_WARMUP_STEPS", "1")
    monkeypatch.setenv("BENCH_MEASURE_STEPS", "1")
    monkeypatch.setenv("BENCH_CHUNK", "1")

    import bench

    importlib.reload(bench)  # re-read the env-dependent module constants
    bench.main()

    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert lines, "bench.py printed no JSON line"
    out = json.loads(lines[-1])
    assert out["metric"] == "wm_connector_grad_steps_per_sec"
    assert np.isfinite(out["value"]) and out["value"] > 0
    assert "vs_baseline" in out and out["baseline_is_estimate"] is True
