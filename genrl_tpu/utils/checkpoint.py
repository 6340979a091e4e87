"""Snapshot / resume as pytree checkpoints (orbax).

Rebuild of the reference snapshot plane (train.py:368-425). The reference
pickles whole torch module objects; here a snapshot is the AgentState pytree
plus counters, written with orbax. Same crash-recovery discipline: a
double-buffered `last_snapshot` with `second_last_snapshot` fallback if the
last write was torn, periodic `snapshot_{frame}` checkpoints, and partial
reset on load (reset_world_model / reset_connector / reset_imag_behavior,
train.py:141-157).
"""

from __future__ import annotations

import shutil
import threading
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    """Pipelined device->host pull: start every leaf's transfer before
    blocking on any (a per-leaf tree_map(np.asarray) pays one link round
    trip per leaf — on a remote-TPU tunnel that serializes hundreds of
    RTTs)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for leaf in leaves:
        if isinstance(leaf, jax.Array):
            leaf.copy_to_host_async()
    return jax.tree_util.tree_unflatten(treedef, [np.asarray(l) for l in leaves])


class SnapshotManager:
    """Double-buffered snapshot store with asynchronous writes.

    save() blocks only for the (pipelined) device->host pull; the orbax
    serialization + atomic last/second_last rotation run in a background
    thread so the train loop is back on the device immediately. At most one
    write is in flight; a second save (or any load) joins the pending one
    first, preserving the torn-write discipline.
    """

    def __init__(self, root_dir: Path):
        self.root = Path(root_dir)
        self.root.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._pending: Optional[threading.Thread] = None
        self._write_err: Optional[BaseException] = None

    def _join_pending(self):
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        if self._write_err is not None:
            # a swallowed writer failure (disk full, serialization error)
            # would let training finish "healthy" with stale snapshots —
            # surface it at the next save/load/wait instead
            err, self._write_err = self._write_err, None
            raise RuntimeError("snapshot write failed") from err

    # ---- paths -----------------------------------------------------------
    def _last(self) -> Path:
        return self.root / "last_snapshot"

    def _second_last(self) -> Path:
        return self.root / "second_last_snapshot"

    # ---- save ---------------------------------------------------------------
    def save(self, state, counters: Dict[str, int], name: Optional[str] = None):
        """Save a named snapshot (e.g. 'snapshot_50000') or rotate the
        last/second_last pair when name is None (reference: train.py:388-398).
        The host copy is taken synchronously (so donated device buffers are
        never referenced from the writer thread); IO happens in background."""
        self._join_pending()
        payload = {"state": _to_host(state), "counters": dict(counters)}
        target = self.root / name if name is not None else None
        self._pending = threading.Thread(
            target=self._write, args=(payload, target), daemon=False)
        self._pending.start()
        return target if target is not None else self._last()

    def _write(self, payload, target: Optional[Path]):
        try:
            self._write_inner(payload, target)
        except BaseException as e:  # noqa: BLE001 — re-raised in _join_pending
            self._write_err = e

    def _write_inner(self, payload, target: Optional[Path]):
        if target is not None:
            if target.exists():
                shutil.rmtree(target)
            self._ckptr.save((target / "ckpt").absolute(), payload)
            self._ckptr.wait_until_finished()
            return
        tmp = self.root / "tmp_snapshot"
        if tmp.exists():
            shutil.rmtree(tmp)
        self._ckptr.save((tmp / "ckpt").absolute(), payload)
        self._ckptr.wait_until_finished()
        last, second = self._last(), self._second_last()
        if last.exists():
            if second.exists():
                shutil.rmtree(second)
            last.rename(second)
        tmp.rename(last)

    def wait_until_finished(self):
        """Block until any in-flight snapshot write has landed."""
        self._join_pending()

    # ---- load -----------------------------------------------------------------
    def _restore(self, path: Path, template):
        payload_template = {"state": _to_host(template), "counters": {"step": 0, "episode": 0}}
        return self._ckptr.restore((path / "ckpt").absolute(), payload_template)

    def load(self, template, path: Optional[Path] = None):
        """Restore (state, counters). Tries `path`, else last, else
        second_last (reference torn-write fallback, train.py:400-410)."""
        self._join_pending()
        candidates = [Path(path)] if path is not None else [self._last(), self._second_last()]
        last_err = None
        for cand in candidates:
            if not cand.exists():
                continue
            try:
                payload = self._restore(cand, template)
                state = jax.tree_util.tree_map(
                    lambda t, v: v, template, payload["state"]
                )
                return state, dict(payload["counters"])
            except Exception as e:  # torn write — fall through
                last_err = e
                continue
        if last_err is not None:
            raise last_err
        return None

    def exists(self) -> bool:
        self._join_pending()
        return self._last().exists() or self._second_last().exists()


def _flatten_cfg(d: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten_cfg(v, key + "."))
        else:
            out[key] = v
    return out


def save_run_config(work_dir, cfg) -> Path:
    """Persist the composed run config as config.json so later runs can find
    this workdir by config match (the search index the reference delegated to
    wandb run metadata, train.py:72-133)."""
    import json

    d = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
    path = Path(work_dir) / "config.json"
    path.write_text(json.dumps(d, indent=2, sort_keys=True, default=str))
    return path


def search_snapshot(root, match: Dict[str, Any],
                    snapshot_step: Optional[int] = None) -> Optional[Path]:
    """Scan experiment workdirs under `root` for one whose saved config
    matches every (flat-dotted key -> value) in `match`; return the snapshot
    path to load (snapshot_{step} if requested, else the last/second_last
    root). Zero-egress port of the reference's wandb run search
    (train.py:72-133): same match-then-resolve-workdir semantics, with
    config.json as the metadata store instead of run.config."""
    import json

    for cfg_path in sorted(Path(root).glob("**/config.json")):
        try:
            flat = _flatten_cfg(json.loads(cfg_path.read_text()))
        except (OSError, ValueError):
            continue
        if not all(flat.get(k) == v for k, v in match.items()):
            continue
        snap_root = cfg_path.parent / "snapshots"
        if snapshot_step is not None:
            cand = snap_root / f"snapshot_{int(snapshot_step)}"
            if cand.exists():
                return cand
            continue
        if (snap_root / "last_snapshot").exists() or \
                (snap_root / "second_last_snapshot").exists():
            return snap_root
    return None


def apply_resets(agent, loaded_state, key, reset_world_model=False,
                 reset_connector=False, reset_imag_behavior=False):
    """Partial re-initialization on load (reference: train.py:141-157):
    swap in freshly-initialized module params + fresh optimizer state."""
    fresh = None
    need_fresh = reset_world_model or reset_connector or reset_imag_behavior
    if need_fresh:
        fresh = agent.init(key)
    state = loaded_state
    if reset_world_model:
        state = state.replace(wm_params=fresh.wm_params, wm_opt=fresh.wm_opt)
    if reset_connector and fresh.connector_params is not None:
        state = state.replace(connector_params=fresh.connector_params,
                              connector_opt=fresh.connector_opt)
    if reset_imag_behavior and fresh.imag is not None:
        state = state.replace(imag=fresh.imag)
    return state


def load_wm_subtree(load_dir, live_wm_params):
    """Cross-agent warm start: pull ONLY `wm_params` out of a foreign
    snapshot (any agent whose WorldModel was built with the same model
    hyperparameters) and fit it to `live_wm_params`' structure.

    Restores the orbax checkpoint WITHOUT a template (raw nested dicts),
    so the donor agent's full AgentState need not match the live agent —
    e.g. a GenRL pretrain snapshot warm-starts a Dreamer collector, or a
    Dreamer collector's online-trained WM seeds a GenRL behavior run.
    Shapes are validated leaf-by-leaf; a mismatch (different preset dims)
    raises instead of silently grafting garbage.
    """
    root = Path(load_dir)
    candidates = [root] if (root / "ckpt").exists() else [
        root / "last_snapshot", root / "second_last_snapshot"]
    raw = None
    for cand in candidates:
        if (cand / "ckpt").exists():
            raw = ocp.StandardCheckpointer().restore((cand / "ckpt").absolute())
            break
    if raw is None:
        raise FileNotFoundError(f"no snapshot under {load_dir}")
    donor = raw["state"]["wm_params"]
    d_leaves, d_def = jax.tree_util.tree_flatten(donor)
    l_leaves, l_def = jax.tree_util.tree_flatten(live_wm_params)
    if len(d_leaves) != len(l_leaves):
        raise ValueError(
            f"wm_params leaf count mismatch: donor {len(d_leaves)} vs live "
            f"{len(l_leaves)} — model hyperparameters differ")
    for i, (d, l) in enumerate(zip(d_leaves, l_leaves)):
        if tuple(np.shape(d)) != tuple(np.shape(l)):
            raise ValueError(
                f"wm_params leaf {i} shape mismatch: donor {np.shape(d)} vs "
                f"live {np.shape(l)} — model hyperparameters differ")
    step = int(raw.get("counters", {}).get("step", -1))
    print(f"warm-started wm_params from {load_dir} (donor step {step}, "
          f"{sum(int(np.size(x)) for x in d_leaves):,} params)")
    return jax.tree_util.tree_unflatten(
        l_def, [np.asarray(d, dtype=l.dtype) for d, l in zip(d_leaves, l_leaves)])
