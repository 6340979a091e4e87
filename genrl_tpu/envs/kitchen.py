"""Franka Kitchen environment — modern-MuJoCo port.

Rebuild of the reference kitchen stack: `KitchenV0/KitchenTaskRelaxV1`
(third_party/relay-policy-learning/adept_envs/.../kitchen_multitask_v0.py),
the velocity-actuation robot layer (franka_robot.py:Robot_VelAct — velocity
commands integrated to position targets under calibration bounds), and the
GenRL task layer `kitchen_extra.py` (per-element sparse/dense rewards with
OBS_ELEMENT_GOALS / BONUS_THRESH) + `KitchenWrapper` (envs/main.py:369-466).

The reference requires the legacy mujoco_py bindings; this port runs on the
modern `mujoco` package. MJCF/mesh assets are carried from the reference as
data under envs/assets/kitchen (with small parser-compat patches: the
kettle's top-level classed default wrapped, `../kitchen/` asset prefixes
normalized, and the upstream-missing wood1.png texture aliased to marble1).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from pathlib import Path

import numpy as np

from genrl_tpu.envs.spaces import BoxSpace

# ---- task tables (reference: envs/kitchen_extra.py:12-40) -------------------------

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
BONUS_THRESH = {
    "bottom burner": 0.5,
    "top burner": 0.5,
    "light switch": 0.5,
    "slide cabinet": 0.2,
    "microwave": 0.25,
    "hinge cabinet": 0.3,
    "kettle": 0.3,
}

# task name -> elements to complete. Single-element tasks are the 7 the
# reference wires into envs.make (envs/main.py:379-385); the multi-element
# ones mirror the remaining kitchen_extra.py task classes
# (KitchenMicrowaveKettleBottomBurnerLightV0 etc., kitchen_extra.py:292-308).
TASK2ELEMENT = {
    "microwave": ("microwave",),
    "kettle": ("kettle",),
    "burner": ("bottom burner",),
    "top_burner": ("top burner",),
    "light": ("light switch",),
    "hinge": ("hinge cabinet",),
    "slide": ("slide cabinet",),
    "microwave_kettle_burner_light":
        ("microwave", "kettle", "bottom burner", "light switch"),
    "microwave_kettle_light_slider":
        ("microwave", "kettle", "light switch", "slide cabinet"),
    "kettle_microwave_light_slider":
        ("kettle", "microwave", "light switch", "slide cabinet"),
    "all": ("bottom burner", "top burner", "light switch", "slide cabinet",
            "hinge cabinet", "microwave", "kettle"),
}

_ASSETS = Path(__file__).resolve().parent / "assets" / "kitchen"
_MODEL_XML = (_ASSETS / "adept_envs" / "adept_envs" / "franka" / "assets"
              / "franka_kitchen_jntpos_act_ab.xml")
_CONFIG_XML = (_ASSETS / "adept_envs" / "adept_envs" / "franka" / "robot"
               / "franka_config.xml")

N_DOF_ROBOT = 9
N_DOF_OBJECT = 21
FRAME_SKIP = 40

# the microwave/kettle/slide/hinge start pose (reference:
# kitchen_multitask_v0.py:60-70 overrides the XML keyframe)
INIT_QPOS = np.array([
    1.48388023e-01, -1.76848573e+00, 1.84390296e+00, -2.47685760e+00,
    2.60252026e-01, 7.12533105e-01, 1.59515394e+00, 4.79267505e-02,
    3.71350919e-02, -2.66279850e-04, -5.18043486e-05, 3.12877220e-05,
    -4.51199853e-05, -3.90842156e-06, -4.22629655e-05, 6.28065475e-05,
    4.04984708e-05, 4.62730939e-04, -2.26906415e-04, -4.65501369e-04,
    -6.44129196e-03, -1.77048263e-03, 1.08009684e-03, -2.69397440e-01,
    3.50383255e-01, 1.61944683e+00, 1.00618764e+00, 4.06395120e-03,
    -6.62095997e-03, -2.68278933e-04,
])


def _read_calibration():
    """Per-dof pos/vel bounds + noise amplitudes
    (reference: franka_robot.py _read_specs_from_config over franka_config.xml)."""
    root = ET.parse(_CONFIG_XML).getroot()
    pos_bound, vel_bound, pos_noise = [], [], []
    for child in root:
        if not child.tag.startswith("qpos"):
            continue
        pb = [float(x) for x in child.attrib["pos_bound"].split()]
        vb = [float(x) for x in child.attrib["vel_bound"].split()]
        pos_bound.append(pb)
        vel_bound.append(vb)
        pos_noise.append(float(child.attrib["pos_noise_amp"]))
    return (np.asarray(pos_bound, np.float64), np.asarray(vel_bound, np.float64),
            np.asarray(pos_noise, np.float64))


class FrankaKitchen:
    """Modern-mujoco KitchenTaskRelaxV1 + GenRL task rewards.

    step(a) with a in [-1,1]^9: velocity command scaled by act_amp=2,
    clipped to calibration velocity bounds, integrated to a position target
    over the control interval, clipped to position bounds, then driven by the
    model's position actuators for frame_skip physics steps
    (reference: KitchenV0.step + Robot_VelAct.step)."""

    def __init__(self, task: str, dense: bool = True, seed: int = 0,
                 size=(64, 64)):
        import mujoco

        self._mujoco = mujoco
        self.model = mujoco.MjModel.from_xml_path(str(_MODEL_XML))
        self.data = mujoco.MjData(self.model)
        self.elements = list(TASK2ELEMENT[task])
        self.dense = dense
        self._rng = np.random.default_rng(seed)
        self._size = size
        self.robot_noise_ratio = 0.1
        self.act_mid = np.zeros(N_DOF_ROBOT)
        self.act_amp = 2.0 * np.ones(N_DOF_ROBOT)
        self.pos_bound, self.vel_bound, self.pos_noise = _read_calibration()
        self.init_qpos = INIT_QPOS.copy()
        self.init_qvel = self.model.key_qvel[0].copy() if self.model.nkey else np.zeros(self.model.nv)
        self.tasks_to_complete = list(self.elements)
        self._renderer = None
        self._step_duration = FRAME_SKIP * self.model.opt.timestep

    # ---- core ------------------------------------------------------------------
    def reset(self):
        mujoco = self._mujoco
        mujoco.mj_resetData(self.model, self.data)
        self.data.qpos[:] = self.init_qpos
        self.data.qvel[:] = self.init_qvel
        # actuators hold the initial robot pose
        self.data.ctrl[:N_DOF_ROBOT] = self.init_qpos[:N_DOF_ROBOT]
        mujoco.mj_forward(self.model, self.data)
        self.tasks_to_complete = list(self.elements)
        return self._get_obs()

    def step(self, action):
        mujoco = self._mujoco
        a = np.clip(np.asarray(action, np.float64), -1.0, 1.0)
        vel = self.act_mid + a * self.act_amp
        vel = np.clip(vel, self.vel_bound[:N_DOF_ROBOT, 0], self.vel_bound[:N_DOF_ROBOT, 1])
        target = self.data.qpos[:N_DOF_ROBOT] + vel * self._step_duration
        target = np.clip(target, self.pos_bound[:N_DOF_ROBOT, 0],
                         self.pos_bound[:N_DOF_ROBOT, 1])
        self.data.ctrl[:N_DOF_ROBOT] = target
        for _ in range(FRAME_SKIP):
            mujoco.mj_step(self.model, self.data)
        obs = self._get_obs()
        reward, bonus = self._reward()
        done = not self.tasks_to_complete  # task complete
        return obs, reward, done, {"bonus": bonus}

    def _get_obs(self):
        qp = self.data.qpos[:N_DOF_ROBOT].copy()
        obj_qp = self.data.qpos[N_DOF_ROBOT:N_DOF_ROBOT + N_DOF_OBJECT].copy()
        # observation noise, reference robot.get_obs (10% of calibration amps)
        noise = self.robot_noise_ratio * self.pos_noise[:N_DOF_ROBOT + N_DOF_OBJECT]
        full = np.concatenate([qp, obj_qp])
        full = full + noise * self._rng.uniform(-1, 1, full.shape)
        goal = np.zeros(30)  # goal masking on, as the reference default
        self._obs_qp = full[:N_DOF_ROBOT]
        self._obs_obj = full[N_DOF_ROBOT:]
        return np.concatenate([full, goal]).astype(np.float32)

    def _reward(self):
        """Per-element distance reward (reference: kitchen_extra.py:129-226)."""
        dense = 0.0
        completions = []
        for element in list(self.tasks_to_complete):
            idx = OBS_ELEMENT_INDICES[element] - N_DOF_ROBOT
            distance = float(np.linalg.norm(self._obs_obj[idx] - OBS_ELEMENT_GOALS[element]))
            dense += -distance
            if distance < BONUS_THRESH[element]:
                completions.append(element)
        for element in completions:
            self.tasks_to_complete.remove(element)
        bonus = float(len(completions))
        return (dense if self.dense else bonus), bonus

    # ---- rendering (reference camera: kitchen_extra.py render) --------------------
    def render(self, resolution=None):
        import mujoco

        resolution = resolution or self._size
        if self._renderer is None or self._renderer.height != resolution[0]:
            self._renderer = mujoco.Renderer(self.model, resolution[0], resolution[1])
        cam = mujoco.MjvCamera()
        cam.distance, cam.azimuth, cam.elevation = 2.2, 70, -35
        cam.lookat[:] = [-0.2, 0.5, 2.0]
        self._renderer.update_scene(self.data, camera=cam)
        return self._renderer.render()


class KitchenWrapper:
    """(TimeStep, obs_dict) protocol over FrankaKitchen
    (reference: KitchenWrapper, envs/main.py:369-466)."""

    def __init__(self, name, seed=0, action_repeat=1, size=(64, 64), dense=True):
        os.environ.setdefault("MUJOCO_GL", "egl")
        self._env = FrankaKitchen(name, dense=dense, seed=seed, size=size)
        self._size = size
        self._action_repeat = action_repeat
        self._eval = False

    def eval_mode(self):
        self._env.dense = False
        self._eval = True

    @property
    def obs_space(self):
        return {
            "observation": BoxSpace(0, 255, (3,) + tuple(self._size), np.uint8),
            "is_first": BoxSpace(0, 1, (), bool),
            "is_last": BoxSpace(0, 1, (), bool),
            "is_terminal": BoxSpace(0, 1, (), bool),
            "state": BoxSpace(-8.0, 8.0, (60,), np.float32),
        }

    @property
    def act_space(self):
        return {"action": BoxSpace(-1.0, 1.0, (N_DOF_ROBOT,), np.float32)}

    def step(self, action):
        import dm_env

        reward = 0.0
        state = None
        for _ in range(self._action_repeat):
            state, rew, done, info = self._env.step(action)
            reward += rew
        obs = {
            "reward": reward,
            "is_first": False,
            "is_last": False,  # TimeLimit wrapper ends episodes
            "is_terminal": False,
            "observation": self._env.render(self._size).transpose(2, 0, 1).copy(),
            "state": state.astype(np.float32),
            "action": np.asarray(action, np.float32),
            "discount": 1,
        }
        if self._eval:
            obs["reward"] = min(obs["reward"], 1)
            if obs["reward"] > 0:
                obs["is_last"] = True
        ts = dm_env.TimeStep(
            step_type=dm_env.StepType.LAST if obs["is_last"] else dm_env.StepType.MID,
            reward=obs["reward"], discount=1, observation=obs["observation"])
        return ts, obs

    def reset(self):
        import dm_env

        state = self._env.reset()
        obs = {
            "reward": 0.0,
            "is_first": True,
            "is_last": False,
            "is_terminal": False,
            "observation": self._env.render(self._size).transpose(2, 0, 1).copy(),
            "state": state.astype(np.float32),
            "action": np.zeros(N_DOF_ROBOT, np.float32),
            "discount": 1,
        }
        ts = dm_env.TimeStep(step_type=dm_env.StepType.FIRST, reward=None,
                             discount=None, observation=obs["observation"])
        return ts, obs

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return getattr(self._env, name)


KITCHEN_TASKS = tuple(TASK2ELEMENT.keys())
