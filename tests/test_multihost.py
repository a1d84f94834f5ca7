"""Multi-host training: 2 jax.distributed processes × 4 virtual CPU devices
= one 8-device dp×fsdp×tp mesh, through the real train CLI (--multihost).

This is the TPU-pod launch path (scripts/launch_pod.sh ≙ reference
runjob_SLURM.sh:37-43): every host runs the same script, loads its local
slice of the global batch, shard_batch assembles global arrays, and the main
process gathers + writes the checkpoint.
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from sd3_tpu.training import train
pid, port, save = sys.argv[1], sys.argv[2], sys.argv[3]
train.main([
    "--multihost", "--coordinator_address", f"localhost:{port}",
    "--num_processes", "2", "--process_id", pid,
    "--preset", "tiny", "--synthetic",
    "--batchSize", "8", "--accumulation_steps", "2", "--totalSteps", "4",
    "--numSaveSteps", "1000000", "--warmup_steps", "1", "--log_steps", "2",
    "--ema_update_freq", "2", "--saveDir", save, "--seed", "3",
    "--dp", "2", "--fsdp", "2", "--tp", "2",
])
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
print(f"MULTIHOST_OK_{pid}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train(tmp_path):
    port = _free_port()
    save = str(tmp_path / "mh_ckpt")
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=4")
    env["XLA_FLAGS"] = " ".join(flags)

    procs = [subprocess.Popen(
        [sys.executable, "-c", CHILD, str(i), str(port), save],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}:\n{out}"
        assert f"MULTIHOST_OK_{i}" in out, out

    # only the main process wrote the (gathered) checkpoint
    assert os.path.exists(os.path.join(save, "model_4s.msgpack")), outs[0]
    # loss logged and finite
    metrics = [f for f in os.listdir(save) if f.startswith("metrics_")]
    assert metrics
    with open(os.path.join(save, metrics[0])) as f:
        recs = [json.loads(l) for l in f]
    assert recs and all(abs(r["loss"]) < 1e6 for r in recs)
