"""Typed-ish config tree with preset composition and CLI overrides.

Replaces the reference's Hydra/OmegaConf stack (train.yaml + conf/ + agent/
yamls, SURVEY.md §5.6) with a dependency-free system that preserves the
public override grammar used in the reference README, e.g.:

    python train.py task=stickman_walk agent=genrl conf/defaults=genrl \
        agent.imag_reward_fn=video_text_reward batch_size=32

Group selectors (`agent=`, `conf/defaults=`, `conf/env=`, `train_mode=`)
compose presets; dotted keys override leaves; `+key=value` adds new keys.
"""

from __future__ import annotations

import ast
import copy
from typing import Any, Dict, List


class Config(dict):
    """Attribute-style nested dict."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "Config":
        out = Config()
        for k, v in d.items():
            out[k] = Config.from_dict(v) if isinstance(v, dict) else v
        return out

    def to_dict(self) -> Dict[str, Any]:
        return {k: (v.to_dict() if isinstance(v, Config) else v) for k, v in self.items()}

    def copy(self) -> "Config":
        return Config.from_dict(copy.deepcopy(self.to_dict()))

    def update_deep(self, other: Dict[str, Any]) -> "Config":
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), dict):
                self[k].update_deep(v)
            else:
                self[k] = Config.from_dict(v) if isinstance(v, dict) else v
        return self

    def set_dotted(self, dotted: str, value: Any, allow_new: bool = False):
        keys = dotted.split(".")
        node = self
        for k in keys[:-1]:
            if k not in node:
                if not allow_new:
                    raise KeyError(f"unknown config group '{k}' in '{dotted}' (use +{dotted}= to add)")
                node[k] = Config()
            node = node[k]
        if keys[-1] not in node and not allow_new:
            raise KeyError(f"unknown config key '{dotted}' (use +{dotted}= to add)")
        node[keys[-1]] = Config.from_dict(value) if isinstance(value, dict) else value


def parse_value(text: str) -> Any:
    low = text.strip()
    if low.lower() in ("null", "none"):
        return None
    if low.lower() == "true":
        return True
    if low.lower() == "false":
        return False
    try:
        return ast.literal_eval(low)
    except (ValueError, SyntaxError):
        return low


def parse_overrides(args: List[str]) -> List[tuple]:
    """-> list of (key, value, allow_new) tuples; group selectors keep raw strings."""
    out = []
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"override '{arg}' must be key=value")
        key, _, val = arg.partition("=")
        allow_new = key.startswith("+")
        if allow_new:
            key = key[1:]
        out.append((key, val, allow_new))
    return out


def compose(presets: Dict[str, Dict[str, Dict]], base: Dict[str, Any], argv: List[str]) -> Config:
    """Compose base + group presets + dotted overrides (in argv order for
    overrides; group selectors are applied first, mirroring Hydra defaults)."""
    cfg = Config.from_dict(base)
    overrides = parse_overrides(argv)
    group_sel, leaf_over = [], []
    for key, val, allow_new in overrides:
        if key in presets:
            group_sel.append((key, val.strip()))
        else:
            leaf_over.append((key, val, allow_new))
    # defaults for unselected groups come pre-applied in `base`
    for group, name in group_sel:
        options = presets[group]
        if name not in options:
            raise KeyError(f"unknown {group} preset '{name}' (have {sorted(options)})")
        cfg.update_deep(copy.deepcopy(options[name]))
    for key, val, allow_new in leaf_over:
        cfg.set_dotted(key, parse_value(val), allow_new=allow_new)
    return cfg
