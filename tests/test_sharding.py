"""Multi-device sharding tests on a virtual 8-device CPU mesh.

Run in a subprocess because the axon TPU plugin pins jax to the TPU platform
in-process; the child switches to CPU before first backend use.
"""

import os
import subprocess
import sys

CHILD = r"""
import jax
jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, jax.devices()

import __graft_entry__
__graft_entry__.dryrun_multichip(8)
__graft_entry__.dryrun_multichip(4)
print("SHARDING_OK")
"""


def test_dryrun_multichip_cpu_mesh():
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    res = subprocess.run([sys.executable, "-c", CHILD], capture_output=True,
                         text=True, timeout=1200, cwd=os.path.dirname(
                             os.path.dirname(os.path.abspath(__file__))))
    assert "SHARDING_OK" in res.stdout, res.stdout + "\n" + res.stderr
    # The sharded train step must compile without GSPMD falling back to
    # replicate-then-repartition reshards (the conditioning-path tensors are
    # pinned with sharding constraints — parallel/sharding.py
    # constrain_replicated/constrain_batch). A reappearance of this warning
    # means a new intermediate lost its layout and is eating ICI bandwidth.
    assert "Involuntary full rematerialization" not in res.stderr, res.stderr
