"""Optimizer construction (optax).

Rebuild of the reference Optimizer wrapper (agent/dreamer_utils.py:871-932):
Adam-family + global-norm clipping + *multiplicative* weight decay
(the reference multiplies params by (1-wd) after each step, independent of
the learning rate — reproduced here as a params-aware transform). No AMP
grad scaler is needed: TPU trains in bf16 compute with f32 params.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from genrl_tpu.ops.math import global_norm


def multiplicative_weight_decay(wd: float) -> optax.GradientTransformation:
    """p_new = (p + u) * (1 - wd)  =>  u' = (1-wd)*u - wd*p."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        assert params is not None
        updates = jax.tree_util.tree_map(lambda u, p: (1.0 - wd) * u - wd * p, updates, params)
        return updates, state

    return optax.GradientTransformation(init, update)


def make_optimizer(opt: str = "adam", lr: float = 1e-4, eps: float = 1e-8,
                   clip: float | None = None, wd: float | None = None) -> optax.GradientTransformation:
    chain = []
    if clip:
        chain.append(optax.clip_by_global_norm(clip))
    if opt == "adam":
        chain.append(optax.adam(lr, eps=eps))
    elif opt == "nadam":
        chain.append(optax.nadam(lr, eps=eps))
    elif opt == "adamax":
        chain.append(optax.adamax(lr, eps=eps))
    elif opt == "sgd":
        chain.append(optax.sgd(lr))
    elif opt == "momentum":
        chain.append(optax.sgd(lr, momentum=0.9))
    else:
        raise NotImplementedError(opt)
    if wd:
        chain.append(multiplicative_weight_decay(wd))
    return optax.chain(*chain)


def apply_updates_with_metrics(tx, grads, opt_state, params, name: str):
    """Apply an optimizer step; returns (new_params, new_opt_state, metrics)
    with the reference's per-step grad-norm metric (dreamer_utils.py:904-913)."""
    metrics = {f"{name}_grad_norm": global_norm(grads)}
    updates, new_opt_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_opt_state, metrics
