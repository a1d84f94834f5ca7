"""sd3_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the capabilities of
gmongaras/Stable-Diffusion-3-From-Scratch.

The reference is a PyTorch+CUDA repo training a ~1.2B-param dual-stream MMDiT
("SD3-style") text-to-image model with rectified flow. This package is NOT a
port: the compute path is Flax/XLA with a Pallas flash-attention kernel for the
joint image+text attention, distribution is a `jax.sharding.Mesh` (dp/fsdp/tp)
with XLA collectives over ICI, and the input pipeline is host-side (no
loader-GPU NCCL p2p daemon).

Layout:
  ops/        low-level blocks: RMSNorm, AdaLN, SwiGLU/GELU MLP, RoPE tables,
              patch embed, joint attention (XLA + Pallas flash kernel)
  models/     MMDiT diffusion transformer; frozen encoders (FLUX VAE, Gemma-2,
              ModernBERT, MetaCLIP text) as Flax modules with HF converters
  parallel/   mesh + sharding rules (dp/fsdp/tp) for pjit
  training/   rectified-flow loss, trainer loop, checkpoint I/O
  inference/  CFG samplers (euler/euler_stochastic/heun) as jitted scans
  data/       parquet + aspect-ratio-bucket input pipeline, indexing CLIs
  evals/      FID harness, image generation driver
  utils/      logging (wandb-optional), profiling
"""

__version__ = "0.1.0"

from sd3_tpu.config import MMDiTConfig  # noqa: F401
