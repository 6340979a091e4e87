"""Test config: run everything on a virtual 8-device CPU mesh.

This is the fake-backend strategy for mesh/pjit code the reference never had
(SURVEY.md §4): XLA_FLAGS forces 8 host devices so sharding tests exercise
real collectives without TPU hardware.
"""

import os

# The deployment environment may pin JAX_PLATFORMS to a hardware plugin via
# sitecustomize; tests must run on the virtual CPU mesh regardless, so force
# the platform through jax.config (which wins over the env var).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# record the deployment's platform pin so driver-path tests can restore it
# in subprocesses (test_multichip_dryrun.py)
os.environ.setdefault(
    "GENRL_TEST_ORIG_JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", ""))
os.environ["JAX_PLATFORMS"] = "cpu"
# transformers must not import tensorflow: the TF shared objects segfault in
# a process that already loaded torch + jax (observed in-suite), and this
# image is zero-egress so HF must stay offline
os.environ["USE_TF"] = "0"
os.environ["TRANSFORMERS_NO_ADVISORY_WARNINGS"] = "1"
os.environ["HF_HUB_OFFLINE"] = "1"
os.environ.setdefault("MUJOCO_GL", "egl")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


REFERENCE_EPISODE = "/root/reference/data/stickman_example"


@pytest.fixture(scope="session")
def fixture_episode_dir():
    if not os.path.isdir(REFERENCE_EPISODE):
        pytest.skip("reference fixture episode not available")
    return REFERENCE_EPISODE
