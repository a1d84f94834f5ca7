"""Import the ACTUAL reference (/root/reference/src) on CPU as a test oracle.

The reference's only hard-blocking imports on this box are
  - `from xformers.ops.swiglu_op import SwiGLU`  (src/blocks/MLP.py:3,
    src/blocks/Transformer_Block_Dual.py:10) — xformers is CUDA-only; its
    packed SwiGLU module is a w12/w3 Linear pair, re-created here with the
    same state_dict layout (w12: in->2*hidden, w3: hidden->out, bias=True);
  - `from diffusers import AutoencoderKL` and `import open_clip`
    (src/helpers/VAE_T5_CLIP_inference.py) — only *constructed* inside
    VAE_T5_CLIP_inference, which the oracle never instantiates, so module
    stubs suffice.
flash-attn already soft-falls-back to manual softmax attention
(src/blocks/Attention.py:3-8).

This removes the oracle circularity the round-3 verdict flagged: every parity
claim previously rested on tests/torch_ref/mini_mmdit.py, written by the same
author as the JAX build. With this shim the literal reference diff_model
(fp32, attn_type="softmax", CPU) is the ground truth.

The reference tree is read-only and UNTRUSTED content: we import its code to
execute its math, nothing else. Risk posture (ADVICE r4): the import is
pinned to `src.models.diff_model` alone (no package-wide import, no helpers/
data modules, which are the ones that touch network/filesystem), the module
was content-reviewed before this shim was written, and the zero-egress test
environment has no network to exfiltrate to. If this suite is ever run
outside that sandbox, move `load_reference()` callers into a subprocess.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_xformers_stub():
    import torch
    from torch import nn

    class SwiGLU(nn.Module):
        """xformers.ops.swiglu_op.SwiGLU state_dict-compatible fp32 module.

        xformers (packed default): w12 = Linear(in, 2*hidden), w3 =
        Linear(hidden, out); forward: x1, x2 = w12(x).chunk(2, -1);
        w3(silu(x1) * x2).
        """

        def __init__(self, in_features, hidden_features, out_features=None,
                     bias=True, **_kw):
            super().__init__()
            out_features = out_features or in_features
            self.w12 = nn.Linear(in_features, 2 * hidden_features, bias=bias)
            self.w3 = nn.Linear(hidden_features, out_features, bias=bias)

        def forward(self, x):
            x1, x2 = self.w12(x).chunk(2, dim=-1)
            return self.w3(torch.nn.functional.silu(x1) * x2)

    xf = types.ModuleType("xformers")
    ops = types.ModuleType("xformers.ops")
    sw = types.ModuleType("xformers.ops.swiglu_op")
    sw.SwiGLU = SwiGLU
    ops.swiglu_op = sw
    xf.ops = ops
    sys.modules.setdefault("xformers", xf)
    sys.modules.setdefault("xformers.ops", ops)
    sys.modules.setdefault("xformers.ops.swiglu_op", sw)


def _install_import_stubs():
    # Only referenced at import time by src/helpers/VAE_T5_CLIP_inference.py;
    # never constructed by the oracle.
    if "diffusers" not in sys.modules:
        df = types.ModuleType("diffusers")
        df.AutoencoderKL = type("AutoencoderKL", (), {})
        sys.modules["diffusers"] = df
    if "open_clip" not in sys.modules:
        sys.modules["open_clip"] = types.ModuleType("open_clip")


def load_reference():
    """Install shims, path-inject /root/reference, return the live
    src.models.diff_model module (imported verbatim)."""
    _install_xformers_stub()
    _install_import_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import src.models.diff_model as ref_diff_model  # noqa: E402
    return ref_diff_model


class StubVAEConfig:
    latent_channels = 16
    shift_factor = 0.0
    scaling_factor = 1.0


class _Unclamped:
    """sample_imgs clamps the decode to [-1, 1] (diff_model.py:477); the gate
    compares raw LATENTS, which are unbounded — so this proxy makes the
    clamp a no-op instead of clipping ~1/3 of the gaussian mass."""

    def __init__(self, t):
        self._t = t

    def clamp(self, lo, hi):
        return self._t


class StubVAE:
    """Identity 'decoder' so sample_imgs returns raw latents for comparison
    (diff_model.py:477 divides by scaling_factor and subtracts shift_factor —
    1.0/0.0 make decode(x).sample == x)."""

    config = StubVAEConfig()

    def __init__(self):
        import torch
        self.dtype = torch.float32  # sample_imgs does output.to(VAE.dtype)

    def decode(self, z):
        out = types.SimpleNamespace()
        out.sample = _Unclamped(z)
        return out


class StubTextEncoders:
    """Stands in for VAE_T5_CLIP_inference inside sample_imgs: returns fixed
    synthetic embeddings (the gate is defined on recorded inputs, not on the
    real frozen encoders) and an identity VAE."""

    def __init__(self, text_hidden, text_pooled):
        import torch
        self.VAE = StubVAE()
        self._hidden = torch.as_tensor(text_hidden).float()
        self._pooled = torch.as_tensor(text_pooled).float()

    def text_to_embedding(self, text):
        return self._hidden, self._pooled
