#!/usr/bin/env python
"""One-command real-weights gate drill.

The repo's remaining "blocked" validation gates (BASELINE.json) all need a
frozen-encoder weights mount and/or the reference's published torch
checkpoint. This script runs the ENTIRE gate suite in order the moment those
exist, and writes a machine-readable report:

  1. weights-layout check        (scripts/fetch_weights.py --check)
  2. encoder/VAE parity tests    (tests/test_weights_parity.py vs transformers
                                  / diffusers — reference VAE_T5_CLIP.py:155-268)
  3. torch checkpoint import     (--torch_ckpt -> our 6-artifact layout;
                                  reference diff_model.py:529-566 loading)
  4. real-image sample           (inference CLI, real conditioning -> PNG)
  5. fp32 euler bit-match        (hermetic golden fixtures; plus exports our
                                  fp32 latents for cross-checking against the
                                  reference implementation when available —
                                  reference diff_model.py:431-460 sampling)
  6. reference-as-oracle         (tests/test_ref_oracle.py — the literal
                                  /root/reference code run on CPU via the
                                  xformers shim; weight-free ground truth)
  7. FID drift, bf16 vs int8     (evals/generate_images.py + calculate_fid —
                                  the int8 serving-quality gate)

Usage:
  SD3_ENCODER_WEIGHTS=/mnt/weights python scripts/run_weight_gates.py \
      [--torch_ckpt /mnt/ckpt/model_675000s.pkl] [--fid_n 5000] \
      [--out /tmp/weight_gates]

  # plumbing dry-run without any weights (stub encoders, tiny model):
  python scripts/run_weight_gates.py --stub --out /tmp/weight_gates_stub

Each stage runs as its own subprocess (TPU memory is released between
stages); a failed stage is recorded and later stages that don't depend on it
still run. Exit code 0 iff every executed stage passed.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_stage(report: dict, name: str, cmd: list[str], env: dict,
              timeout: int = 7200, depends: list[str] | None = None) -> bool:
    for dep in depends or []:
        if report["stages"].get(dep, {}).get("status") != "passed":
            report["stages"][name] = {"status": "skipped",
                                      "reason": f"dependency {dep} not passed"}
            print(f"[{name}] SKIPPED (needs {dep})", flush=True)
            return False
    print(f"[{name}] $ {' '.join(cmd)}", flush=True)
    t0 = time.time()
    try:
        res = subprocess.run(cmd, cwd=REPO, env=env, text=True,
                             capture_output=True, timeout=timeout)
        ok = res.returncode == 0
        tail = (res.stdout + res.stderr)[-4000:]
    except subprocess.TimeoutExpired:
        ok, tail = False, f"timeout after {timeout}s"
    report["stages"][name] = {
        "status": "passed" if ok else "failed",
        "seconds": round(time.time() - t0, 1),
        "log_tail": tail,
    }
    print(f"[{name}] {'PASSED' if ok else 'FAILED'} "
          f"({report['stages'][name]['seconds']}s)", flush=True)
    return ok


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights_dir",
                   default=os.environ.get("SD3_ENCODER_WEIGHTS"))
    p.add_argument("--torch_ckpt", default=None,
                   help="reference torch checkpoint (e.g. "
                        "/mnt/ckpt/model_675000s.pkl); its model_params JSON "
                        "must sit next to it (--torch_def)")
    p.add_argument("--torch_def", default=None,
                   help="params JSON filename next to the torch checkpoint "
                        "(default: model_params_<step>s.json)")
    p.add_argument("--ckpt_step", type=int, default=675000)
    p.add_argument("--fid_prompts", default=None,
                   help="prompts file for FID generation "
                        "(evals/generate_images --prompts_file)")
    p.add_argument("--num_per_prompt", type=int, default=8,
                   help="images per prompt for the FID sets (5000-image FID "
                        "= 625 prompts x 8)")
    p.add_argument("--out", default="/tmp/weight_gates")
    p.add_argument("--stub", action="store_true",
                   help="no-weights plumbing dry-run: stub encoders, tiny "
                        "model, tiny FID counts")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    report = {"stub_mode": args.stub, "weights_dir": args.weights_dir,
              "torch_ckpt": args.torch_ckpt, "stages": {}}
    py = sys.executable

    if args.stub:
        # ---- plumbing drill: everything that can run weight-free ----------
        ckpt_dir = os.path.join(args.out, "ckpt")
        run_stage(report, "tiny_train_ckpt", [
            py, "-m", "sd3_tpu.training.train", "--preset", "tiny",
            "--synthetic", "--batchSize", "2", "--accumulation_steps", "1",
            "--totalSteps", "2", "--numSaveSteps", "2", "--warmup_steps", "1",
            "--ema_update_freq", "2", "--log_steps", "1",
            "--saveDir", ckpt_dir], env)
        run_stage(report, "sample_stub", [
            py, "-m", "sd3_tpu.inference.infer", "--loadDir", ckpt_dir,
            "--step", "2", "--text_input", "gate drill", "--num_steps", "2",
            "--width", "16", "--height", "16", "--batch_size", "1",
            "--stub_encoders", "--seed", "1",
            "--out_imgname", os.path.join(args.out, "sample")],
            env, depends=["tiny_train_ckpt"])
        run_stage(report, "bit_match_hermetic", [
            py, "-m", "pytest", "tests/test_golden_parity.py", "-q"], env)
        run_stage(report, "reference_oracle", [
            py, "-m", "pytest", "tests/test_ref_oracle.py", "-q"], env)
        run_stage(report, "fid_smoke", [
            py, "-m", "pytest", "tests/test_eval_cli.py", "-q"], env)
    else:
        if not args.weights_dir:
            print("no SD3_ENCODER_WEIGHTS / --weights_dir; use --stub for a "
                  "plumbing dry-run", file=sys.stderr)
            return 2
        env["SD3_ENCODER_WEIGHTS"] = args.weights_dir

        # 1. layout check
        run_stage(report, "weights_layout", [
            py, "scripts/fetch_weights.py", "--check",
            "--weights_dir", args.weights_dir], env)
        # 2. encoder/VAE parity vs transformers/diffusers
        run_stage(report, "encoder_parity", [
            py, "-m", "pytest", "tests/test_weights_parity.py", "-q",
            "--no-header"], env, depends=["weights_layout"])
        # 3. torch checkpoint import (optional)
        ckpt_dir = os.path.join(args.out, "imported_ckpt")
        if args.torch_ckpt:
            tdir = os.path.dirname(os.path.abspath(args.torch_ckpt))
            tfile = os.path.basename(args.torch_ckpt)
            tdef = args.torch_def or f"model_params_{args.ckpt_step}s.json"
            import_code = (
                "import sys; sys.path.insert(0, {repo!r})\n"
                "from sd3_tpu.training import checkpoint as ck\n"
                "cfg, params = ck.load_torch_checkpoint({d!r}, {f!r}, {j!r})\n"
                "ck.save_checkpoint({o!r}, cfg, params, ema_params=params,\n"
                "                   step={s})\n"
                "print('imported')\n").format(
                    repo=REPO, d=tdir, f=tfile, j=tdef, o=ckpt_dir,
                    s=args.ckpt_step)
            run_stage(report, "torch_import", [py, "-c", import_code], env,
                      depends=["weights_layout"])
            # 4. real-image sample from the imported reference checkpoint
            run_stage(report, "real_sample", [
                py, "-m", "sd3_tpu.inference.infer", "--loadDir", ckpt_dir,
                "--step", str(args.ckpt_step), "--ema",
                "--text_input", "a photo of a red fox in the snow",
                "--num_steps", "40", "--guidance", "6",
                "--width", "512", "--height", "512", "--batch_size", "4",
                "--seed", "7",
                "--out_imgname", os.path.join(args.out, "real_sample")],
                env, depends=["torch_import"])
            # 5. fp32 euler bit-match: hermetic goldens + export our fp32
            # latents for comparison against the reference run
            # the literal /root/reference code as CPU ground truth (no
            # weights needed — validates oracle + importer + sampler logic)
            run_stage(report, "reference_oracle", [
                py, "-m", "pytest", "tests/test_ref_oracle.py", "-q"], env)
            run_stage(report, "bit_match_hermetic", [
                py, "-m", "pytest", "tests/test_golden_parity.py", "-q"], env)
            run_stage(report, "export_fp32_latents", [
                py, "-m", "sd3_tpu.inference.infer", "--loadDir", ckpt_dir,
                "--step", str(args.ckpt_step), "--ema", "--dtype", "float32",
                "--text_input", "a photo of a red fox in the snow",
                "--num_steps", "20", "--guidance", "5",
                "--width", "256", "--height", "256", "--batch_size", "1",
                "--seed", "1234", "--save_latents",
                os.path.join(args.out, "fp32_latents.npy"),
                "--out_imgname", os.path.join(args.out, "bitmatch_sample")],
                env, depends=["torch_import"])
            # 6. FID drift bf16 vs int8 (5k images = 625 prompts x 8)
            gen = [py, "-m", "sd3_tpu.evals.generate_images",
                   "--loadDir", ckpt_dir, "--step", str(args.ckpt_step),
                   "--ema", "--num_per_prompt", str(args.num_per_prompt),
                   "--batch_size", "16", "--num_steps", "20", "--res", "256"]
            if args.fid_prompts:
                gen += ["--prompts_file", args.fid_prompts]
            run_stage(report, "fid_generate_bf16",
                      gen + ["--out_dir", os.path.join(args.out, "fid_bf16")],
                      env, depends=["torch_import"])
            run_stage(report, "fid_generate_int8",
                      gen + ["--quant", "int8",
                             "--out_dir", os.path.join(args.out, "fid_int8")],
                      env, depends=["torch_import"])
            run_stage(report, "fid_drift_score", [
                py, "-m", "sd3_tpu.evals.calculate_fid", "score",
                "--generated_dir", os.path.join(args.out, "fid_int8"),
                "--ref_dir", os.path.join(args.out, "fid_bf16")],
                env, depends=["fid_generate_bf16", "fid_generate_int8"])
        else:
            report["stages"]["torch_import"] = {
                "status": "skipped", "reason": "no --torch_ckpt given"}

    n_failed = sum(1 for s in report["stages"].values()
                   if s["status"] == "failed")
    report["ok"] = n_failed == 0
    out_path = os.path.join(args.out, "report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report: {out_path}  ok={report['ok']}")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
