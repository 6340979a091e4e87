"""Import reference PyTorch agent snapshots (whole-module pickles).

The reference saves snapshots as `torch.save({'agent': <GenRLAgent module>,
'_global_step': ...})` — the agent is pickled WHOLE, module objects included
(reference: train.py:368-374). Published pretrained models
(e.g. genrl_stickman_500k_2.pt) therefore can't be read as plain state
dicts. This loader unpickles with an ALLOWLIST (only tensor/ndarray
reconstruction helpers resolve; every other class — including importable
ones — becomes an inert stub, so an untrusted .pt cannot execute code),
walks the reconstructed `_parameters/_modules` graph into a flat
name->array dict, and maps those names onto this framework's param trees
(SURVEY.md §7 hard part (c)).

Weight-layout transforms: torch Linear [out, in] -> flax kernel [in, out];
Conv2d [O, I, kh, kw] -> [kh, kw, I, O]; ConvTranspose2d [I, O, kh, kw] ->
flax transpose_kernel [kh, kw, O, I]; the reference's fused GRU matrix
[3S, inp+S] splits into this framework's input/recurrent halves.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Optional

import numpy as np


class _Stub:
    """Placeholder for any class the unpickler can't resolve."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple) and state and isinstance(state[0], dict):
            self.__dict__.update(state[0])

    def __reduce__(self):  # pragma: no cover
        raise pickle.PicklingError("stub")


# Only what tensor/ndarray reconstruction genuinely needs may resolve to a
# real callable; EVERYTHING else unpickles as an inert _Stub.  A published
# reference .pt is untrusted input — resolving arbitrary importables
# (os.system, builtins.eval, torch serialization gadgets) would hand it
# code execution.
_ALLOWED = {
    ("collections", "OrderedDict"),
    ("_codecs", "encode"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("torch._utils", "_rebuild_tensor"),
    ("torch._utils", "_rebuild_tensor_v2"),
    ("torch._utils", "_rebuild_parameter"),
    ("torch._utils", "_rebuild_meta_tensor_no_storage"),
    ("torch.serialization", "_get_layout"),
    ("torch", "Size"),
    ("torch", "device"),
}


def _is_allowed(module: str, name: str) -> bool:
    if (module, name) in _ALLOWED:
        return True
    # torch storage classes (FloatStorage, BFloat16Storage, UntypedStorage…)
    # and dtype singletons (torch.float32 …) pickle as attrs of `torch`
    if module == "torch":
        if name.endswith("Storage"):
            return True
        import torch

        return isinstance(getattr(torch, name, None), torch.dtype)
    return False


def _make_unpickler_module():
    class AllowlistUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if _is_allowed(module, name):
                return super().find_class(module, name)
            return type(name, (_Stub,), {"__module__": module})

    class Shim:
        Unpickler = AllowlistUnpickler
        load = staticmethod(pickle.load)

    return Shim


def load_reference_snapshot(path) -> Dict[str, Any]:
    """torch.load a reference snapshot with stubbed classes. Returns the
    payload dict (agent object graph + counters)."""
    import torch

    return torch.load(path, map_location="cpu",
                      pickle_module=_make_unpickler_module(),
                      weights_only=False)


def flatten_module(obj, prefix: str = "") -> Dict[str, np.ndarray]:
    """Walk `_parameters`/`_buffers`/`_modules` of a (stubbed or real) torch
    module graph into {dotted_name: ndarray} — a state_dict equivalent."""
    import torch

    out: Dict[str, np.ndarray] = {}

    def visit(node, pre):
        d = getattr(node, "__dict__", None)
        if d is None:
            return
        for coll in ("_parameters", "_buffers"):
            for name, value in (d.get(coll) or {}).items():
                if value is None:
                    continue
                if isinstance(value, torch.Tensor):
                    out[pre + name] = value.detach().float().cpu().numpy()
        for name, child in (d.get("_modules") or {}).items():
            if child is not None:
                visit(child, f"{pre}{name}.")

    visit(obj, prefix)
    return out


# ------------------------------------------------------------------------------
# name mapping
# ------------------------------------------------------------------------------


def _put(tree: Dict, path: str, value: np.ndarray):
    node = tree
    parts = [p for p in path.split("/") if p]
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


class _Mapper:
    def __init__(self, flat: Dict[str, np.ndarray]):
        self.flat = flat
        self.tree: Dict[str, Any] = {}
        self.used = set()
        self.missing = []

    def take(self, src: str) -> Optional[np.ndarray]:
        if src in self.flat:
            self.used.add(src)
            return self.flat[src]
        self.missing.append(src)
        return None

    def linear(self, src: str, dst: str):
        w = self.take(f"{src}.weight")
        if w is not None:
            _put(self.tree, f"{dst}/kernel", w.T)
        if f"{src}.bias" in self.flat:
            _put(self.tree, f"{dst}/bias", self.take(f"{src}.bias"))

    def ln(self, src: str, dst: str):
        w = self.take(f"{src}.weight")
        if w is not None:
            _put(self.tree, f"{dst}/scale", w)
        if f"{src}.bias" in self.flat:
            _put(self.tree, f"{dst}/bias", self.take(f"{src}.bias"))

    def normed_linear(self, src_lin: str, src_ln: str, dst: str):
        """reference Sequential(Linear, NormLayer) -> our NormedLinear."""
        self.linear(src_lin, f"{dst}/Dense_0")
        if f"{src_ln}._layer.weight" in self.flat:
            self.ln(f"{src_ln}._layer", f"{dst}/NormLayer_0/LayerNorm_0")

    def conv(self, src: str, dst: str):
        w = self.take(f"{src}.weight")
        if w is not None:
            _put(self.tree, f"{dst}/kernel", w.transpose(2, 3, 1, 0))
        if f"{src}.bias" in self.flat:
            _put(self.tree, f"{dst}/bias", self.take(f"{src}.bias"))

    def deconv(self, src: str, dst: str):
        w = self.take(f"{src}.weight")  # [I, O, kh, kw]
        if w is not None:
            _put(self.tree, f"{dst}/kernel", w.transpose(2, 3, 1, 0))
        if f"{src}.bias" in self.flat:
            _put(self.tree, f"{dst}/bias", self.take(f"{src}.bias"))

    def gru(self, src: str, dst: str, inp_size: int):
        w = self.take(f"{src}._layer.weight")  # [3S, inp+S]
        if w is not None:
            _put(self.tree, f"{dst}/wx/kernel", w[:, :inp_size].T)
            _put(self.tree, f"{dst}/wd/kernel", w[:, inp_size:].T)
        if f"{src}._layer.bias" in self.flat:
            _put(self.tree, f"{dst}/wd/bias", self.take(f"{src}._layer.bias"))
        if f"{src}._norm.weight" in self.flat:
            self.ln(f"{src}._norm", f"{dst}/ln")

    # ---- composite blocks ------------------------------------------------------
    def rssm(self, src: str, dst: str, hidden: int, has_posterior: bool, ensemble: int = 1):
        self.normed_linear(f"{src}._img_in.0", f"{src}._img_in.1", f"{dst}/img_in")
        self.gru(f"{src}._cell", f"{dst}/cell", hidden)
        for k in range(ensemble):
            self.normed_linear(f"{src}._ensemble_img_out.{k}.0",
                               f"{src}._ensemble_img_out.{k}.1",
                               f"{dst}/ens_img_out{k}")
            self.linear(f"{src}._ensemble_img_dist.{k}", f"{dst}/ens_img_dist{k}")
        if has_posterior:
            self.normed_linear(f"{src}._obs_out.0", f"{src}._obs_out.1", f"{dst}/obs_out")
            self.linear(f"{src}._obs_dist", f"{dst}/obs_dist")

    def mlp_head(self, src: str, dst: str, layers: int, has_std: bool = False):
        """reference MLP (dense{i}/norm{i} + _out DistLayer) -> our MLPHead."""
        for i in range(layers):
            self.normed_linear(f"{src}.dense{i}", f"{src}.norm{i}", f"{dst}/dense{i}")
        self.linear(f"{src}._out._out", f"{dst}/head/out")
        if has_std and f"{src}._out._std.weight" in self.flat:
            self.linear(f"{src}._out._std", f"{dst}/head/std")

    def encoder(self, src: str, dst: str, n_convs: int, n_mlp: int = 0):
        for i in range(n_convs):
            self.conv(f"{src}._conv_model.{3 * i}", f"{dst}/conv{i}")
            if f"{src}._conv_model.{3 * i + 1}.norm.weight" in self.flat:
                self.ln(f"{src}._conv_model.{3 * i + 1}.norm",
                        f"{dst}/convnorm{i}/LayerNorm_0")
        for i in range(n_mlp):
            self.normed_linear(f"{src}._mlp_model.{2 * i}", f"{src}._mlp_model.{2 * i + 1}",
                               f"{dst}/mlp{i}")

    def decoder(self, src: str, dst: str, n_convs: int):
        self.linear(f"{src}._conv_in.0", f"{dst}/conv_in")
        for i in range(n_convs):
            self.deconv(f"{src}._conv_model.{3 * i}", f"{dst}/deconv{i}")
            if f"{src}._conv_model.{3 * i + 1}.norm.weight" in self.flat:
                self.ln(f"{src}._conv_model.{3 * i + 1}.norm",
                        f"{dst}/denorm{i}/LayerNorm_0")

    def residual_linear(self, src: str, dst: str):
        self.linear(f"{src}.layer", f"{dst}/Dense_0")
        if f"{src}.norm_layer._layer.weight" in self.flat:
            self.ln(f"{src}.norm_layer._layer", f"{dst}/NormLayer_0/LayerNorm_0")
        if f"{src}.res_proj.weight" in self.flat:
            self.linear(f"{src}.res_proj", f"{dst}/res_proj")

    def unet(self, src: str, dst: str, n_layers: int = 2):
        for i in range(n_layers):
            self.residual_linear(f"{src}.down.{i}", f"{dst}/down{i}")
            self.residual_linear(f"{src}.mid.{i}", f"{dst}/mid{i}")
            self.residual_linear(f"{src}.up.{i}", f"{dst}/up{i}")

    def initial_state_pred(self, src: str, dst: str):
        # reference Sequential: 0 Linear, 1 NormLayer, 2 act, 3 Linear,
        # 4 NormLayer, 5 act, 6 Linear (video_utils.py:89-95)
        self.normed_linear(f"{src}.0", f"{src}.1", f"{dst}/NormedLinear_0")
        self.normed_linear(f"{src}.3", f"{src}.4", f"{dst}/NormedLinear_1")
        self.linear(f"{src}.6", f"{dst}/Dense_0")


def convert_reference_agent(flat: Dict[str, np.ndarray], agent) -> Dict[str, Any]:
    """Map a flattened reference agent onto {wm_params, connector_params,
    acting_actor, acting_critic, imag_actor, imag_critic} param trees (raw,
    un-jax'd). Missing pieces are simply absent — merge over a fresh init."""
    cfg = agent.cfg
    hidden = int(cfg.rssm.hidden)
    n_convs = len(tuple(cfg.encoder.cnn_kernels))
    n_deconvs = len(tuple(cfg.decoder.cnn_kernels))
    head_layers = int(cfg.reward_head.layers)
    actor_layers = int(cfg.actor.layers)
    critic_layers = int(cfg.critic.layers)

    out: Dict[str, Any] = {}

    m = _Mapper(flat)
    m.encoder("wm.encoder", "encoder", n_convs)
    m.rssm("wm.rssm", "rssm", hidden, has_posterior=True,
           ensemble=int(cfg.rssm.ensemble))
    m.decoder("wm.heads.decoder", "decoder", n_deconvs)
    m.mlp_head("wm.heads.reward", "reward", head_layers)
    if getattr(agent, "wm", None) is not None and agent.wm.pred_discount:
        m.mlp_head("wm.heads.discount", "discount", int(cfg.discount_head.layers))
    out["wm_params"] = {"params": m.tree}
    wm_missing = list(m.missing)

    conn = _Mapper(flat)
    conn_hidden = int(cfg.agent.connector_rssm.hidden) if "connector_rssm" in cfg.agent else hidden
    conn.rssm("wm.connector", "", conn_hidden, has_posterior=False)
    conn.unet("wm.connector.aligner", "aligner")
    conn.initial_state_pred("wm.connector.initial_state_pred", "initial_state_pred")
    out["connector_params"] = {"params": conn.tree}

    for ref_name, ours in (("_acting_behavior", "acting"), ("_imag_behavior", "imag")):
        am = _Mapper(flat)
        am.mlp_head(f"{ref_name}.actor", "", actor_layers, has_std=True)
        cm = _Mapper(flat)
        cm.mlp_head(f"{ref_name}.critic", "", critic_layers)
        tm = _Mapper(flat)
        tm.mlp_head(f"{ref_name}._target_critic", "", critic_layers)
        out[f"{ours}_actor"] = {"params": am.tree}
        out[f"{ours}_critic"] = {"params": cm.tree}
        out[f"{ours}_target_critic"] = {"params": tm.tree}
    out["_missing"] = wm_missing
    return out


def _merge(template, imported):
    """Overlay imported leaves onto a template pytree (shape-checked)."""
    import jax.numpy as jnp

    if isinstance(template, dict):
        return {k: _merge(template[k], imported.get(k)) if imported else template[k]
                for k in template} if not isinstance(imported, dict) else {
            k: _merge(template[k], imported.get(k)) for k in template}
    if imported is None:
        return template
    imported = jnp.asarray(imported)
    assert template.shape == imported.shape, (template.shape, imported.shape)
    return imported.astype(template.dtype)


def import_reference_snapshot(path, agent, template_state):
    """Load a reference .pt snapshot and return (AgentState, counters) with
    every recognized weight transplanted onto the template (fresh optimizer
    state — torch Adam moments are not transferable to optax 1:1)."""
    payload = load_reference_snapshot(path)
    agent_obj = payload.get("agent", payload)
    flat = flatten_module(agent_obj)
    converted = convert_reference_agent(flat, agent)

    state = template_state
    state = state.replace(wm_params=_merge(state.wm_params, converted["wm_params"]))
    if state.connector_params is not None and converted["connector_params"]["params"]:
        state = state.replace(connector_params=_merge(
            state.connector_params, converted["connector_params"]))
    acting = state.acting
    if converted["acting_actor"]["params"]:
        acting = acting.replace(
            actor_params=_merge(acting.actor_params, converted["acting_actor"]),
            critic_params=_merge(acting.critic_params, converted["acting_critic"]),
            target_critic_params=_merge(acting.target_critic_params,
                                        converted["acting_target_critic"]))
        state = state.replace(acting=acting)
    if state.imag is not None and converted["imag_actor"]["params"]:
        imag = state.imag.replace(
            actor_params=_merge(state.imag.actor_params, converted["imag_actor"]),
            critic_params=_merge(state.imag.critic_params, converted["imag_critic"]),
            target_critic_params=_merge(state.imag.target_critic_params,
                                        converted["imag_target_critic"]))
        state = state.replace(imag=imag)
    counters = {"step": int(payload.get("_global_step", 0)),
                "episode": int(payload.get("_global_episode", 0))}
    return state, counters
