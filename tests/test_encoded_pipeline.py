"""On-device encoded-batch pipeline (stub encoders) and the multi-process
ring loader over a tiny parquet dataset."""

import io
import os

import numpy as np
import pytest


def _png_bytes(h, w, v):
    from PIL import Image
    buf = io.BytesIO()
    arr = np.full((h, w, 3), v, np.uint8)
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def parquet_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path_factory.mktemp("pq2")
    rows = [{"image": _png_bytes(16, 16, 10 * (i % 20)),
             "recaption": f"caption {i}", "recaption_short": f"c{i}",
             "bucket_size": "16x16"} for i in range(16)]
    pq.write_table(pa.Table.from_pylist(rows), str(d / "p.parquet"))
    return str(d)


def test_encoded_batch_iter_shapes(parquet_dir):
    from sd3_tpu.config import tiny_config
    from sd3_tpu.data.encoded import encoded_batch_iter
    from sd3_tpu.models.text_encoders import load_text_encoders
    from sd3_tpu.training.trainer import TrainConfig

    cfg = tiny_config(inCh=16)  # stub VAE emits FLUX's 16 latent channels
    tcfg = TrainConfig(batch_size=2, accumulation_steps=2)
    enc = load_text_encoders(stub=True, model_cfg=cfg)
    it = encoded_batch_iter(cfg, tcfg, parquet_dir, encoders=enc)
    batch = next(it)
    assert batch["x0"].shape == (2, 2, 16, 2, 2)      # 16px/8 = 2 latent
    assert batch["text"].shape == (2, 2, cfg.text_tokens, cfg.text_hidden_dim)
    assert batch["pooled"].shape == (2, 2, cfg.class_dim)
    assert np.isfinite(batch["x0"]).all()


def test_ring_data_loader(parquet_dir):
    from sd3_tpu.data.ringbuffer import RingDataLoader
    loader = RingDataLoader(parquet_dir, batch_size=4, num_workers=1,
                            slot_mb=8, num_slots=4)
    try:
        for _ in range(3):
            batch = next(loader)
            assert batch["image"].shape == (4, 3, 16, 16)
            assert len(batch["caption"]) == 4
            assert batch["bucket"] == "16x16"
    finally:
        loader.close()
