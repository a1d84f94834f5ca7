"""Recaption orchestration (data/recaption.py) — hermetic, stub models."""

import io

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from sd3_tpu.data.recaption import (caption_failed, postprocess_caption,
                                    recaption_dataframe, recaption_folder,
                                    split_manifest, stub_models)


def _img_bytes(seed=0):
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _df(n=12):
    return pd.DataFrame({"image": [_img_bytes(i) for i in range(n)],
                         "class": [f"thing{i}" for i in range(n)]})


def test_postprocess_strips_openings():
    assert postprocess_caption("The image shows a red fox.") == "A red fox."
    assert postprocess_caption("In this artwork, a boat.") == "Artwork of a boat."
    assert postprocess_caption("A plain caption.") == "A plain caption."


def test_caption_failed_heuristics():
    assert caption_failed("word word word")            # <3 unique words
    assert caption_failed(" no text" * 6 + " filler blah blah")
    assert not caption_failed("A detailed scene with many objects present")


def test_recaption_dataframe_columns_and_failures():
    captioner, distiller = stub_models()

    def flaky_captioner(images, hints):
        # first row degenerates -> dropped by the failure heuristic
        caps = captioner(images, hints)
        if hints and hints[0] == "thing0":
            caps[0] = "blah blah blah"
        return caps

    out = recaption_dataframe(_df(), flaky_captioner, distiller,
                              batch_size=5, min_rows=5)
    assert list(out.columns) == ["image", "class", "recaption",
                                 "recaption_short"]
    assert len(out) == 11  # one failure dropped
    assert out["recaption"].str.len().min() > 0
    assert (out["recaption_short"].str.split().str.len() <= 40).all()


def test_recaption_dataframe_min_rows():
    bad_captioner = lambda images, hints: ["x x x"] * len(images)
    _, distiller = stub_models()
    with pytest.raises(RuntimeError, match="collapsed"):
        recaption_dataframe(_df(), bad_captioner, distiller)


def test_split_manifest_and_folder_resume(tmp_path):
    src, dst = tmp_path / "in", tmp_path / "out"
    src.mkdir()
    for i in range(3):
        _df().to_parquet(src / f"part{i}.parquet", index=False)

    splits = split_manifest(str(src), 2)
    assert splits[0] == ["part0.parquet", "part2.parquet"]
    assert splits[1] == ["part1.parquet"]

    captioner, distiller = stub_models()
    done = recaption_folder(str(src), str(dst), captioner, distiller,
                            num_splits=2, split_idx=0, min_rows=5)
    assert done == ["part0.parquet", "part2.parquet"]
    assert sorted(p.name for p in dst.glob("*.parquet")) == done
    df = pd.read_parquet(dst / "part0.parquet")
    assert "recaption" in df and "recaption_short" in df

    # resume: outputs already present are skipped (and not rewritten)
    mtime = (dst / "part0.parquet").stat().st_mtime_ns
    done2 = recaption_folder(str(src), str(dst), captioner, distiller,
                             num_splits=2, split_idx=0, min_rows=5)
    assert done2 == done
    assert (dst / "part0.parquet").stat().st_mtime_ns == mtime


def test_hf_models_call_path(monkeypatch):
    """Exercises the real hf_models() plumbing (prompt templating, left-pad
    slice, batch decode) with faked transformers classes — the weights
    themselves don't exist in this environment (reference
    recaption_parquets.py:43-118 backends)."""
    import numpy as np
    import torch
    import transformers

    from sd3_tpu.data import recaption

    class FakeTok:
        pad_token = None
        eos_token = "<eos>"
        pad_token_id = 0
        padding_side = "right"

        def apply_chat_template(self, conv, tokenize=False,
                                add_generation_prompt=True):
            return conv[-1]["content"]

        def __call__(self, texts, **kw):
            n = len(texts)
            ids = torch.ones((n, 4), dtype=torch.long)
            return type("B", (), {"to": lambda s, d: {"input_ids": ids},
                                  "__getitem__": lambda s, k: ids})()

        def batch_decode(self, out, skip_special_tokens=True):
            return [f"short {i}" for i in range(out.shape[0])]

    class FakeProcessor:
        tokenizer = FakeTok()

        @classmethod
        def from_pretrained(cls, *a, **k):
            return cls()

        def apply_chat_template(self, conv, add_generation_prompt=True):
            txt = conv[-1]["content"][-1]["text"]
            assert "Hint:" in txt  # reference prompt template applied
            return txt

        def __call__(self, images=None, text=None, **kw):
            n = len(text)
            ids = torch.ones((n, 5), dtype=torch.long)
            d = {"input_ids": ids}
            return type("B", (), {"to": lambda s, dev: d})()

        def batch_decode(self, gen, skip_special_tokens=True):
            return [f"a long caption {i}" for i in range(gen.shape[0])]

    class FakeModel:
        @classmethod
        def from_pretrained(cls, *a, **k):
            return cls()

        def to(self, device):
            return self

        def eval(self):
            return self

        def generate(self, input_ids=None, **kw):
            n = input_ids.shape[0]
            return torch.ones((n, input_ids.shape[1] + 3), dtype=torch.long)

    class FakeAutoTok:
        @classmethod
        def from_pretrained(cls, *a, **k):
            return FakeTok()

    # transformers is a _LazyModule: setattr on it does NOT override what
    # `from transformers import X` resolves, so swap the whole module.
    import sys
    import types
    fake_mod = types.ModuleType("transformers")
    fake_mod.LlavaNextProcessor = FakeProcessor
    fake_mod.LlavaNextForConditionalGeneration = FakeModel
    fake_mod.AutoTokenizer = FakeAutoTok
    fake_mod.AutoModelForCausalLM = FakeModel
    monkeypatch.setitem(sys.modules, "transformers", fake_mod)

    captioner, distiller = recaption.hf_models(device="cpu")
    imgs = [np.zeros((4, 4, 3), np.uint8)] * 2
    caps = captioner(imgs, ["alt a", "alt b"])
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)
    shorts = distiller(caps)
    assert len(shorts) == 2 and all(isinstance(s, str) for s in shorts)
