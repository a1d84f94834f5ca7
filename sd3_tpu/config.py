"""Model configuration.

Mirrors the self-describing checkpoint JSON of the reference
(/root/reference/src/models/diff_model.py:104-123 `defaults`), so converted
reference checkpoints are loadable and our own checkpoints carry the same
hyperparameter record.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

ATTN_TYPES = (
    "softmax",
    "softmax_flash",
    "both",
    "cosine",
    "cosine2",
    "cosine3",
    "cosine4",
    "cosine_norm",
    "relu",
    "silu",
    "exp",
)
POS_ENCODINGS = ("absolute", "RoPE", "NoPE", "RoPE2d", "RoPE2dV2")
MLP_TYPES = ("gelu", "swiglu", "swiglu_old")

# Number of tokens per text encoder stream (Gemma / ModernBERT), and the width
# both streams are padded/projected from (reference diff_model.py:164).
TEXT_TOKENS_PER_ENCODER = 77
TEXT_HIDDEN_DIM = 2304


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    """Hyperparameters of the dual-stream MMDiT.

    Field names intentionally match the reference checkpoint JSON keys
    (reference diff_model.py:104-123) plus a few TPU-side extras.
    """

    inCh: int = 16                     # VAE latent channels
    class_dim: int = 768               # pooled (CLIP) conditioning width
    patch_size: int = 2
    dim: int = 1216                    # 64 * num_blocks at the published config
    hidden_scale: float = 4.0
    num_heads: int = 19
    attn_type: str = "softmax_flash"
    MLP_type: str = "swiglu"
    num_blocks: int = 19
    positional_encoding: str = "RoPE2d"
    max_res_orig: int = 256            # resolution of the first training stage
    max_res: int = 256                 # current-stage max resolution (pixels)
    kv_merge_attn: bool = False        # pairwise k/v merging (halves KV length)
    qk_half_dim: bool = False          # q/k projected to dim/2
    text_loss: bool = False            # auxiliary text-reconstruction loss head
    start_step: int = 0
    wandb_id: str | None = None

    # --- TPU-side extras (not present in reference JSON; defaulted on load) ---
    # Compute dtype for the transformer ("bfloat16" or "float32"). Parameters
    # are always stored in float32.
    dtype: str = "bfloat16"
    # Apply positional interpolation (1/RoPE_Scale) to the 2D axial RoPE path.
    # The reference quirk: interpolation is applied in its RoPE-1D and RoPE2dV2
    # paths but NOT in the RoPE2d axial path (reference rotary_embedding.py:269-288
    # uses raw arange positions). False reproduces the reference.
    rope2d_interpolate: bool = False
    # Raw text conditioning geometry (reference hardcodes 77 tokens/encoder and
    # 2304 hidden — diff_model.py:164, VAE_T5_CLIP.py:419-427). Overridable so
    # tests can run tiny.
    text_tokens_per_encoder: int = TEXT_TOKENS_PER_ENCODER
    text_hidden_dim: int = TEXT_HIDDEN_DIM
    # Absolute-PE table geometry (reference hardcodes a 256-token max grid
    # with base_size=128 — ImagePositionalEncoding.py:128-131, built from
    # height=256/patch_size=2 at diff_model.py:192-204).
    pos_embed_max_size: int = 256
    pos_embed_base_size: int = 128
    # Inference-only quantization of the projection/MLP matmuls ("none" or
    # "int8"). Runtime choice, deliberately NOT persisted in checkpoint JSON —
    # checkpoints always store float weights; convert with
    # ops/quant.py::quantize_params.
    quant: str = "none"
    # Per-layer int8 fallback: dense names (ops/quant.py QUANT_LAYER_NAMES)
    # kept in the float path under quant="int8" — the knob the int8 quality
    # drift policy turns when a layer group proves quantization-sensitive
    # (e.g. ("w12",)). Runtime-only, like `quant`.
    quant_skip: tuple = ()

    def __post_init__(self):
        assert self.quant in ("none", "int8"), self.quant
        if not isinstance(self.quant_skip, tuple):
            object.__setattr__(self, "quant_skip", tuple(self.quant_skip))
        assert self.attn_type in ATTN_TYPES, self.attn_type
        assert self.positional_encoding in POS_ENCODINGS, self.positional_encoding
        assert self.MLP_type in MLP_TYPES, self.MLP_type
        assert self.dim % self.num_heads == 0
        if self.qk_half_dim:
            assert (self.dim // 2) % self.num_heads == 0

    # ---- derived quantities -------------------------------------------------
    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def dim_qk(self) -> int:
        return self.dim // 2 if self.qk_half_dim else self.dim

    @property
    def head_dim_qk(self) -> int:
        return self.dim_qk // self.num_heads

    @property
    def rope_scale(self) -> float:
        """RoPE_Scale = max_res_orig / max_res (reference diff_model.py:88)."""
        return self.max_res_orig / self.max_res

    @property
    def text_tokens(self) -> int:
        return 2 * self.text_tokens_per_encoder

    @property
    def hidden_dim(self) -> int:
        return int(self.dim * self.hidden_scale)

    def img_tokens(self, height: int, width: int) -> int:
        """Number of image tokens for a latent of (height, width)."""
        return (height // self.patch_size) * (width // self.patch_size)

    # ---- JSON round-trip (checkpoint `model_params_{step}s.json`) -----------
    _JSON_KEYS = (
        "inCh", "class_dim", "patch_size", "dim", "hidden_scale", "num_heads",
        "attn_type", "MLP_type", "num_blocks", "positional_encoding",
        "max_res_orig", "max_res", "kv_merge_attn", "qk_half_dim", "text_loss",
        "start_step", "wandb_id",
    )

    # TPU-side extras are persisted too (harmless extra keys; reference JSONs
    # without them get the defaults on load).
    _EXTRA_JSON_KEYS = ("dtype", "rope2d_interpolate",
                        "text_tokens_per_encoder", "text_hidden_dim",
                        "pos_embed_max_size", "pos_embed_base_size")

    def to_json_dict(self) -> dict[str, Any]:
        d = {k: getattr(self, k) for k in self._JSON_KEYS + self._EXTRA_JSON_KEYS}
        # The reference also persists a "device" key; keep it for byte-level
        # compatibility of the params JSON (reference diff_model.py:120).
        d["device"] = "cpu"
        return d

    def to_json(self) -> str:
        return json.dumps(self.to_json_dict())

    @classmethod
    def from_json_dict(cls, d: dict[str, Any], **overrides) -> "MMDiTConfig":
        d = dict(d)
        d.pop("device", None)
        # Back-compat defaults, as in reference diff_model.py:562-565.
        d.setdefault("MLP_type", "swiglu_old")
        d.setdefault("text_loss", False)
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in known}
        d.update(overrides)
        return cls(**d)

    @classmethod
    def from_json(cls, s: str, **overrides) -> "MMDiTConfig":
        return cls.from_json_dict(json.loads(s), **overrides)

    def replace(self, **kw) -> "MMDiTConfig":
        return dataclasses.replace(self, **kw)


def published_config(stage_res: int = 256) -> MMDiTConfig:
    """The ~1.2B-param published configuration (reference train.py:34-63)."""
    num_blocks = 19
    return MMDiTConfig(
        inCh=16,
        class_dim=768,
        patch_size=2,
        dim=64 * num_blocks,
        hidden_scale=4.0,
        num_heads=num_blocks,
        attn_type="softmax_flash",
        MLP_type="swiglu",
        num_blocks=num_blocks,
        positional_encoding="RoPE2d",
        max_res_orig=256,
        max_res=stage_res,
    )


def tiny_config(**overrides) -> MMDiTConfig:
    """A small config for tests."""
    kw = dict(
        inCh=4,
        class_dim=16,
        patch_size=2,
        dim=32,
        hidden_scale=2.0,
        num_heads=2,
        attn_type="softmax",
        MLP_type="swiglu",
        num_blocks=2,
        positional_encoding="RoPE2d",
        max_res_orig=16,
        max_res=16,
        dtype="float32",
        text_tokens_per_encoder=7,
        text_hidden_dim=24,
        pos_embed_max_size=16,
    )
    kw.update(overrides)
    return MMDiTConfig(**kw)
