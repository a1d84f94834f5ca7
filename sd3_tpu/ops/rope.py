"""Rotary position embeddings: 1-D, 2-D axial, and the "RoPE2dV2" 3-rotation
experiment — matching the reference variants exactly.

Reference sources of truth:
- 1-D / 2-D axial: vendored lucidrains rotary-embedding-torch
  (reference src/blocks/rotary_embedding.py). Frequencies are
  `1/theta^(arange(0,dim,2)/dim)`, each repeated twice *consecutively*
  ([f0,f0,f1,f1,...]), applied with the interleaved-pair rotation
  (pairs (x_{2i}, x_{2i+1}) -> (x cosθ - x' sinθ, ...)).
- 2-D axial ("RoPE2d"): `get_axial_freqs(H, W)` builds per-axis angle tables of
  width head_dim/2 each and concatenates along the feature axis
  (rotary_embedding.py:269-288). NOTE the reference quirk: this path uses raw
  `arange` positions — the `interpolate_factor` (resolution interpolation) is
  NOT applied (only `get_seq_pos`, used by the 1-D path, divides by it). We
  reproduce that by default and expose `interpolate_factor` for the designed-for
  behavior.
- "RoPE2dV2": rotates coordinate triplets (x1,x2,x3) by two angles θ (rows) and
  α (cols) — reference rotary_embedding_2d_v2.py:16-46. This path DOES divide
  positions by interpolate_factor, and its output *concatenates* the three
  strided groups (0::3, 1::3, 2::3) rather than re-interleaving them.

All rotations are computed in float32 and cast back to the input dtype, which
is what the reference's autocast-disabled fp32 promotion does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: all angle/trig tables are computed with NUMPY and lru_cached — host
# constants are safe to cache across jit/remat traces (a jnp-built cache
# entry created inside a trace would leak tracers).


def _interleave_repeat(freqs: np.ndarray) -> np.ndarray:
    """[f0, f1, ...] -> [f0, f0, f1, f1, ...] along the last axis."""
    return np.repeat(freqs, 2, axis=-1)


def _rotate_half_interleaved(x: jax.Array) -> jax.Array:
    """(x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)."""
    x = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    x1 = x[..., 0]
    x2 = x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x.shape[:-2], -1)


def apply_rope(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Apply interleaved-pair rotary embedding.

    x: (..., D) with D >= angles.shape[-1]; only the first angles.shape[-1]
    features are rotated (the remainder passes through, as in the reference's
    apply_rotary_emb start/end split).
    angles: broadcastable to x's leading dims, last dim = rot_dim.
    """
    dtype = x.dtype
    rot = angles.shape[-1]
    xf = x.astype(jnp.float32)
    x_rot, x_pass = xf[..., :rot], xf[..., rot:]
    a = np.asarray(angles, np.float32)
    out = x_rot * np.cos(a) + _rotate_half_interleaved(x_rot) * np.sin(a)
    if x_pass.shape[-1]:
        out = jnp.concatenate([out, x_pass], axis=-1)
    return out.astype(dtype)


@functools.lru_cache(maxsize=64)
def _rope1d_angles_cached(n: int, dim: int, interpolate_factor: float, theta: float):
    pos = np.arange(n, dtype=np.float32) / interpolate_factor
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32)[: dim // 2] / dim))
    angles = pos[:, None] * inv[None, :]
    return _interleave_repeat(angles)  # (n, dim)


def rope1d_angles(n: int, dim: int, interpolate_factor: float = 1.0,
                  theta: float = 10000.0) -> np.ndarray:
    """Angle table (n, dim) for the 1-D "RoPE" path (positions / interp)."""
    return _rope1d_angles_cached(int(n), int(dim), float(interpolate_factor), float(theta))


@functools.lru_cache(maxsize=64)
def _rope2d_axial_angles_cached(h: int, w: int, head_dim: int,
                                interpolate_factor: float, theta: float):
    dim_r = head_dim // 2  # per-axis rotation width
    inv = 1.0 / (theta ** (np.arange(0, dim_r, 2, dtype=np.float32)[: dim_r // 2] / dim_r))
    pos_h = np.arange(h, dtype=np.float32) / interpolate_factor
    pos_w = np.arange(w, dtype=np.float32) / interpolate_factor
    ang_h = _interleave_repeat(pos_h[:, None] * inv[None, :])  # (h, dim_r)
    ang_w = _interleave_repeat(pos_w[:, None] * inv[None, :])  # (w, dim_r)
    ang_h = np.broadcast_to(ang_h[:, None, :], (h, w, dim_r))
    ang_w = np.broadcast_to(ang_w[None, :, :], (h, w, dim_r))
    return np.concatenate([ang_h, ang_w], axis=-1)  # (h, w, head_dim)


def rope2d_axial_angles(h: int, w: int, head_dim: int,
                        interpolate_factor: float = 1.0,
                        theta: float = 10000.0) -> np.ndarray:
    """Angle table (h, w, head_dim) for the 2-D axial "RoPE2d" path.

    interpolate_factor defaults to 1.0 — reference behavior (see module doc).
    """
    return _rope2d_axial_angles_cached(int(h), int(w), int(head_dim),
                                       float(interpolate_factor), float(theta))


def apply_rope2d(x: jax.Array, h: int, w: int,
                 interpolate_factor: float = 1.0) -> jax.Array:
    """Apply 2-D axial RoPE to image tokens.

    x: (B, H_heads, N, D) with N == h*w. Returns same shape.
    """
    b, nh, n, d = x.shape
    assert n == h * w, (n, h, w)
    angles = rope2d_axial_angles(h, w, d, interpolate_factor).reshape(n, d)
    return apply_rope(x, angles)


def apply_rope1d(x: jax.Array, interpolate_factor: float = 1.0) -> jax.Array:
    """Apply 1-D RoPE along the second-to-last axis. x: (..., N, D)."""
    n, d = x.shape[-2], x.shape[-1]
    angles = rope1d_angles(n, d, interpolate_factor)
    return apply_rope(x, angles)


# ----------------------------------------------------------------------------
# RoPE2dV2: 3-D rotation of coordinate triplets over 2-D positions
# (reference rotary_embedding_2d_v2.py). dim is truncated to a multiple of 3.
# ----------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _rope2dv2_trig_cached(h: int, w: int, head_dim: int, interpolate_factor: float):
    dim3 = (head_dim // 3) * 3
    inv = 1.0 / (10000.0 ** (np.arange(0, dim3, 3, dtype=np.float32) / dim3))
    pos_h = np.arange(h, dtype=np.float32)[:, None] / interpolate_factor
    pos_w = np.arange(w, dtype=np.float32)[:, None] / interpolate_factor
    thetas = (pos_h * inv[None, :])[:, None, :]   # (h, 1, dim3/3)
    alphas = (pos_w * inv[None, :])[None, :, :]   # (1, w, dim3/3)
    return (np.sin(thetas), np.cos(thetas), np.sin(alphas), np.cos(alphas))


def apply_rope2dv2(x: jax.Array, h: int, w: int,
                   interpolate_factor: float = 1.0) -> jax.Array:
    """x: (B, H_heads, N, D), N == h*w. Rotates triplets; output concatenates
    the three strided groups (matching the reference's cat([...], -1))."""
    b, nh, n, d = x.shape
    assert n == h * w
    dtype = x.dtype
    dim3 = (d // 3) * 3
    t_sin, t_cos, a_sin, a_cos = _rope2dv2_trig_cached(h, w, d, float(interpolate_factor))

    xf = x.astype(jnp.float32).reshape(b, nh, h, w, d)
    xs = xf[..., :dim3]
    x1, x2, x3 = xs[..., 0::3], xs[..., 1::3], xs[..., 2::3]

    # Broadcast trig tables (h, w, dim3/3) over (b, nh, h, w, dim3/3).
    t_sin = t_sin[None, None]
    t_cos = t_cos[None, None]
    a_sin = a_sin[None, None]
    a_cos = a_cos[None, None]

    g1 = x1 * t_cos + x2 * (-t_sin) * a_cos + x3 * t_sin * a_sin
    g2 = x1 * t_sin + x2 * t_cos * a_cos + x3 * (-t_cos) * a_sin
    g3 = x2 * a_sin + x3 * a_cos
    rot = jnp.concatenate([g1, g2, g3], axis=-1)
    out = jnp.concatenate([rot, xf[..., dim3:]], axis=-1) if dim3 < d else rot
    return out.reshape(b, nh, n, d).astype(dtype)
