"""Driver-path test for __graft_entry__.dryrun_multichip.

The driver imports __graft_entry__ in a process whose environment pins
JAX_PLATFORMS to the remote-TPU plugin (sitecustomize) — NOT via the module's
__main__ block.  Round 1 failed exactly there (MULTICHIP_r01.json rc=1):
dryrun_multichip must guarantee its own n-device CPU mesh regardless of the
caller's jax platform.  This test reproduces the driver call in a subprocess
with the hardware-pinned env RESTORED (conftest forces cpu for the test
process itself, so we undo that for the child).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_from_driver_import_path():
    env = dict(os.environ)
    # restore the deployment pinning the conftest stripped: the driver's
    # process sees JAX_PLATFORMS=axon and no host-device-count XLA flag
    env["JAX_PLATFORMS"] = env.get("GENRL_TEST_ORIG_JAX_PLATFORMS", "axon")
    env.pop("XLA_FLAGS", None)
    env.pop("_GENRL_DRYRUN_CHILD", None)
    code = "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-u", "-c", code],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (proc.stdout[-4000:], proc.stderr[-4000:])
    assert "dryrun_multichip(8): ok" in proc.stdout, proc.stdout[-4000:]
