"""On-device frozen-encoder preprocessing — the TPU replacement for the
reference's loader-GPU service (VAE_T5_CLIP.py).

The reference dedicates 2 of 8 GPUs to running the frozen VAE + 3 text
encoders and streams results over NCCL p2p. On TPU the encoders are jitted
XLA programs that run on the SAME chips between training steps (they are tiny
next to a 1.2B-param train step), or offline in a precompute pass; the host
pipeline only decodes/collates. One compiled encode program per bucket shape.
"""

from __future__ import annotations

from typing import Iterator

import jax
import numpy as np

from sd3_tpu.data.pipeline import HostDataLoader, ParquetImageText
from sd3_tpu.models.text_encoders import load_text_encoders


def encoded_batch_iter(cfg, tcfg, parquet_folder: str,
                       bucket_indices_path: str | None = None,
                       encoders=None, seed: int = 0) -> Iterator[dict]:
    """Yields trainer batches {x0, text, pooled} with a leading
    accumulation-steps axis, encoding raw images/captions on device."""
    encoders = encoders or load_text_encoders(stub=True)
    ds = ParquetImageText(parquet_folder, bucket_indices_path)
    loader = HostDataLoader(ds, batch_size=tcfg.batch_size, seed=seed)
    rng = jax.random.PRNGKey(seed)

    while True:
        x0s, texts, pooleds = [], [], []
        bucket0 = None
        while len(x0s) < tcfg.accumulation_steps:
            batch = next(loader)
            # one optimizer step must be shape-uniform across micro-steps
            if bucket0 is None:
                bucket0 = batch["bucket"]
            elif batch["bucket"] != bucket0:
                continue
            rng, k = jax.random.split(rng)
            lat = encoders.vae_encode(jax.numpy.asarray(batch["image"]), k)
            hid, pooled = encoders.text_to_embedding(batch["caption"])
            x0s.append(np.asarray(lat, np.float32))
            texts.append(np.asarray(hid, np.float32))
            pooleds.append(np.asarray(pooled, np.float32))
        yield {"x0": np.stack(x0s), "text": np.stack(texts),
               "pooled": np.stack(pooleds)}
