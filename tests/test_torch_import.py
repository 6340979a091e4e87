"""Reference-snapshot importer: stub unpickling of whole-module torch
pickles + name/layout mapping onto our param trees, verified numerically
against torch forwards for the conv encoder and the fused GRU."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _build_fake_reference_agent():
    """A torch module tree with the reference's attribute naming
    (dreamer_utils.py / video_utils.py) at tiny scale."""
    mod = types.ModuleType("fake_reference_mod")

    class NormLayer(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self._layer = nn.LayerNorm(dim)

        def forward(self, x):
            return self._layer(x)

    class ImgChLayerNorm(nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.norm = nn.LayerNorm(ch, eps=1e-3)

        def forward(self, x):
            return self.norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

    class GRUCell(nn.Module):
        def __init__(self, inp, size):
            super().__init__()
            self._layer = nn.Linear(inp + size, 3 * size, bias=False)
            self._norm = nn.LayerNorm(3 * size)

    class DistLayer(nn.Module):
        def __init__(self, in_dim, out_dim, std=False):
            super().__init__()
            self._out = nn.Linear(in_dim, out_dim)
            if std:
                self._std = nn.Linear(in_dim, out_dim)

    class MLP(nn.Module):
        def __init__(self, inp, units, out, layers=2, std=False):
            super().__init__()
            last = inp
            for i in range(layers):
                self.add_module(f"dense{i}", nn.Linear(last, units, bias=False))
                self.add_module(f"norm{i}", NormLayer(units))
                last = units
            self._out = DistLayer(units, out, std=std)

    H, D, S, K, A, E = 16, 16, 4 * 4, 4, 4, 8  # hidden, deter, stoch-flat, disc, act, embed-ish

    rssm = nn.Module()
    rssm._img_in = nn.Sequential(nn.Linear(S + A, H, bias=False), NormLayer(H))
    rssm._cell = GRUCell(H, D)
    rssm._ensemble_img_out = nn.ModuleList([
        nn.Sequential(nn.Linear(D, H, bias=False), NormLayer(H))])
    rssm._ensemble_img_dist = nn.ModuleList([nn.Linear(H, S)])
    rssm._obs_out = nn.Sequential(nn.Linear(64, H, bias=False), NormLayer(H))
    rssm._obs_dist = nn.Linear(H, S)

    encoder = nn.Module()
    encoder._conv_model = nn.Sequential(
        nn.Conv2d(3, 8, 4, stride=2), ImgChLayerNorm(8), nn.SiLU(),
        nn.Conv2d(8, 16, 4, stride=2), ImgChLayerNorm(16), nn.SiLU())

    decoder = nn.Module()
    decoder._conv_in = nn.Sequential(nn.Linear(S, 32 * 8))  # decoder_inputs='stoch'
    decoder._conv_model = nn.Sequential(
        nn.ConvTranspose2d(32 * 8, 8, 6, stride=2), ImgChLayerNorm(8), nn.SiLU(),
        nn.ConvTranspose2d(8, 3, 6, stride=2), nn.Identity(), nn.Identity())

    heads = nn.ModuleDict({"decoder": decoder,
                           "reward": MLP(S + D, 32, 255, layers=2)})
    wm = nn.Module()
    wm.encoder = encoder
    wm.rssm = rssm
    wm.heads = heads

    connector = nn.Module()
    connector._img_in = nn.Sequential(nn.Linear(S + E + 4, H, bias=False), NormLayer(H))
    connector._cell = GRUCell(H, D)
    connector._ensemble_img_out = nn.ModuleList([
        nn.Sequential(nn.Linear(D, H, bias=False), NormLayer(H))])
    connector._ensemble_img_dist = nn.ModuleList([nn.Linear(H, S)])

    class ResidualLinear(nn.Module):
        def __init__(self, i, o):
            super().__init__()
            self.layer = nn.Linear(i, o)
            self.norm_layer = NormLayer(o)
            self.res_proj = nn.Identity() if i == o else nn.Linear(i, o)

    aligner = nn.Module()
    aligner.down = nn.ModuleList([ResidualLinear(E, E), ResidualLinear(E, E // 2)])
    aligner.mid = nn.ModuleList([ResidualLinear(E // 2, E // 2), ResidualLinear(E // 2, E // 2)])
    aligner.up = nn.ModuleList([ResidualLinear(E, E), ResidualLinear(E + E, E)])
    connector.aligner = aligner
    connector.initial_state_pred = nn.Sequential(
        nn.Linear(E + 4, H), NormLayer(H), nn.SiLU(),
        nn.Linear(H, H), NormLayer(H), nn.SiLU(), nn.Linear(H, D))
    wm.connector = connector

    class ActorCritic(nn.Module):
        def __init__(self):
            super().__init__()
            self.actor = MLP(S + D, 32, A, layers=2, std=True)
            self.critic = MLP(S + D, 32, 255, layers=2)
            self._target_critic = MLP(S + D, 32, 255, layers=2)

    agent = nn.Module()
    agent.wm = wm
    agent._acting_behavior = ActorCritic()
    agent._imag_behavior = ActorCritic()

    for name, cls in [("NormLayer", NormLayer), ("ImgChLayerNorm", ImgChLayerNorm),
                      ("GRUCell", GRUCell), ("DistLayer", DistLayer), ("MLP", MLP),
                      ("ResidualLinear", ResidualLinear), ("ActorCritic", ActorCritic)]:
        cls.__module__ = mod.__name__
        cls.__qualname__ = name
        setattr(mod, name, cls)
    sys.modules[mod.__name__] = mod
    return agent, mod.__name__


def test_stub_unpickle_and_flatten(tmp_path):
    from genrl_tpu.utils.torch_import import flatten_module, load_reference_snapshot

    agent, modname = _build_fake_reference_agent()
    path = tmp_path / "snapshot.pt"
    torch.save({"agent": agent, "_global_step": 123, "_global_episode": 7}, path)
    del sys.modules[modname]  # force the stub path for every custom class

    payload = load_reference_snapshot(path)
    assert payload["_global_step"] == 123
    flat = flatten_module(payload["agent"])
    assert "wm.rssm._cell._layer.weight" in flat
    assert "wm.connector.aligner.down.0.layer.weight" in flat
    assert "_acting_behavior.actor._out._std.weight" in flat
    ref = agent.wm.rssm._cell._layer.weight.detach().numpy()
    np.testing.assert_array_equal(flat["wm.rssm._cell._layer.weight"], ref)


def test_gru_split_numerics():
    """Reference fused GRU == our split-weight GRUCell after conversion."""
    from genrl_tpu.models.layers import GRUCell as JaxGRU
    from genrl_tpu.utils.torch_import import _Mapper

    H, S = 16, 16
    lin = nn.Linear(H + S, 3 * S, bias=False)
    norm = nn.LayerNorm(3 * S)
    with torch.no_grad():
        norm.weight.normal_()
        norm.bias.normal_()
    flat = {
        "cell._layer.weight": lin.weight.detach().numpy(),
        "cell._norm.weight": norm.weight.detach().numpy(),
        "cell._norm.bias": norm.bias.detach().numpy(),
    }
    m = _Mapper(flat)
    m.gru("cell", "cell", H)
    params = {"params": m.tree["cell"]}

    x = np.float32(np.random.default_rng(0).normal(size=(3, H)))
    d = np.float32(np.random.default_rng(1).normal(size=(3, S)))

    # torch reference math (dreamer_utils.py:770-785)
    with torch.no_grad():
        parts = norm(lin(torch.tensor(np.concatenate([x, d], -1))))
        r, c, u = torch.chunk(parts, 3, -1)
        r = torch.sigmoid(r)
        c = torch.tanh(r * c)
        u = torch.sigmoid(u - 1)
        ref = (u * c + (1 - u) * torch.tensor(d)).numpy()

    cell = JaxGRU(size=S, norm=True)
    out = cell.apply(params, jnp.asarray(x), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_full_import_overlays_params(tmp_path):
    """End-to-end: fake reference snapshot -> import onto a tiny GenRL agent;
    imported leaves match the torch tensors through the layout transforms."""
    from genrl_tpu.agents.assembly import GenRLAgent
    from genrl_tpu.configs import TRAIN_BASE
    from genrl_tpu.utils.config import Config
    from genrl_tpu.utils.torch_import import import_reference_snapshot

    agent_t, modname = _build_fake_reference_agent()
    path = tmp_path / "snap.pt"
    torch.save({"agent": agent_t, "_global_step": 5, "_global_episode": 1}, path)
    del sys.modules[modname]

    cfg = Config.from_dict(TRAIN_BASE)
    cfg.update_deep(dict(
        rssm=dict(ensemble=1, hidden=16, deter=16, stoch=4, discrete=4,
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
        ensemble=1, hidden=16, deter=16, stoch=4, discrete=4, norm="layer",
        std_act="softplus", min_std=0.1, single_obs_posterior=False,
        learn_initial=True)}})
    agent = GenRLAgent(cfg, {"observation": (16, 16, 3)}, act_dim=4,
                       viclip_emb_dim=8, n_frames=4)
    template = agent.init(jax.random.PRNGKey(0))

    state, counters = import_reference_snapshot(path, agent, template)
    assert counters == {"step": 5, "episode": 1}

    # encoder conv kernel transplanted with the (O,I,kh,kw)->(kh,kw,I,O) map
    ref_w = agent_t.wm.encoder._conv_model[0].weight.detach().numpy()
    got = np.asarray(state.wm_params["params"]["encoder"]["conv0"]["kernel"])
    np.testing.assert_allclose(got, ref_w.transpose(2, 3, 1, 0), atol=1e-6)
    # actor dense transplanted
    ref_a = agent_t._imag_behavior.actor.dense0.weight.detach().numpy()
    got_a = np.asarray(state.imag.actor_params["params"]["dense0"]["Dense_0"]["kernel"])
    np.testing.assert_allclose(got_a, ref_a.T, atol=1e-6)
    # connector aligner transplanted
    ref_u = agent_t.wm.connector.aligner.down[0].layer.weight.detach().numpy()
    got_u = np.asarray(state.connector_params["params"]["aligner"]["down0"]
                       ["Dense_0"]["kernel"])
    np.testing.assert_allclose(got_u, ref_u.T, atol=1e-6)


def test_unpickler_stubs_malicious_callables(tmp_path):
    """The allowlist unpickler must NOT resolve importable gadget classes:
    a REDUCE of os.system (or builtins.eval) unpickles as an inert stub."""
    import torch

    from genrl_tpu.utils.torch_import import load_reference_snapshot

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("echo pwned > " + str(tmp_path / "pwned"),))

    path = tmp_path / "evil.pt"
    torch.save({"agent": Evil(), "_global_step": 1}, path)
    payload = load_reference_snapshot(path)
    assert not (tmp_path / "pwned").exists(), "gadget executed!"
    # the gadget collapses to a stub instance, counters still readable
    assert payload["_global_step"] == 1
    assert type(payload["agent"]).__name__ == "system"
