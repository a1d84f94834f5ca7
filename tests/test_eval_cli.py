"""End-to-end eval path: train a tiny checkpoint -> generate_images CLI ->
calculate_fid CLI (hermetic features)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_generate_then_fid(tmp_path):
    ck = str(tmp_path / "ck")
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"))

    def run(args):
        r = subprocess.run([sys.executable, "-m"] + args, cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        return r.stdout

    run(["sd3_tpu.training.train", "--preset", "tiny", "--synthetic",
         "--batchSize", "2", "--accumulation_steps", "1", "--totalSteps", "2",
         "--numSaveSteps", "2", "--warmup_steps", "1", "--log_steps", "1",
         "--saveDir", ck])

    prompts = str(tmp_path / "prompts.txt")
    with open(prompts, "w") as f:
        f.write("a fox\na cat\n")
    gen = str(tmp_path / "gen")
    run(["sd3_tpu.evals.generate_images", "--loadDir", ck, "--step", "2",
         "--prompts_file", prompts, "--num_per_prompt", "2",
         "--batch_size", "2", "--num_steps", "2", "--res", "16",
         "--out_dir", gen, "--stub_encoders"])
    assert os.path.exists(os.path.join(gen, "0", "1.png"))
    assert os.path.exists(os.path.join(gen, "manifest.json"))

    out = run(["sd3_tpu.evals.calculate_fid", "score",
               "--generated_dir", os.path.join(gen, "0"),
               "--ref_dir", os.path.join(gen, "1")])
    assert "FID:" in out

    out = run(["sd3_tpu.evals.calculate_fid", "score", "--per_class",
               "--generated_dir", gen, "--ref_dir", gen])
    assert "mean FID" in out
