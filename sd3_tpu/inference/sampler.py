"""CFG flow samplers as jit-compiled scans.

reference diff_model.sample_imgs (diff_model.py:367-480):
- timesteps = linspace(1, 1/num_steps, num_steps), dt = 1/num_steps
- CFG via a doubled batch: first half conditional, second half with all three
  null masks set; v = (1+w)·v_cond − w·v_uncond; optional "dynamic" quadratic
  scale w·t² (flag, diff_model.py:410-414)
- samplers: euler (x ← x − v·dt), euler_stochastic
  (x ← x − v·dt + σ(t)·noise·√dt with σ = t(1−t)/(1−t+0.008)), and heun
  (2nd-order, two model evals)

The whole loop is a `lax.scan` over steps so one XLA program runs the full
sampling trajectory on-device; the model is evaluated once per step on the
doubled batch (twice for heun).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

SAMPLERS = ("euler", "euler_stochastic", "heun")


def make_velocity_fn(model, params, text_hidden, text_pooled):
    """Build v(x, t) with CFG doubling baked in.

    text_hidden: (B, S, D); text_pooled: (B, P) — conditioning for the B
    images being sampled (already repeated per-image as needed).
    """
    b = text_hidden.shape[0]
    null = jnp.concatenate([jnp.zeros((b,), bool), jnp.ones((b,), bool)])
    th2 = jnp.concatenate([text_hidden, text_hidden], axis=0)
    tp2 = jnp.concatenate([text_pooled, text_pooled], axis=0)

    def velocity(x, t, cfg_scale):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * b,), t, jnp.float32)
        out = model.apply({"params": params}, x2, t2, th2, tp2,
                          null, null, null)
        if isinstance(out, tuple):
            out = out[0]
        v_c, v_u = out[:b], out[b:]
        return (1.0 + cfg_scale) * v_c - cfg_scale * v_u

    return velocity


def _scan_sampler(velocity_fn: Callable, x_init: jax.Array, rng: jax.Array,
                  num_steps: int, cfg_scale, sampler: str,
                  dynamic_cfg: bool) -> jax.Array:
    assert sampler in SAMPLERS, sampler
    timesteps = jnp.linspace(1.0, 1.0 / num_steps, num_steps)
    dt = 1.0 / num_steps

    def step(carry, t):
        x, key = carry
        w = cfg_scale * (t ** 2) if dynamic_cfg else cfg_scale
        v = velocity_fn(x, t, w)
        if sampler == "euler":
            x = x - v * dt
        elif sampler == "euler_stochastic":
            sigma = (t * (1 - t) / (1 - t + 0.008))
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x.shape, x.dtype)
            x = x - v * dt + sigma * noise * jnp.sqrt(dt)
        elif sampler == "heun":
            x_pred = x - v * dt
            v2 = velocity_fn(x_pred, t - dt, w)
            x = x - (dt / 2.0) * (v + v2)
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x_init, rng), timesteps)
    return x


@functools.partial(jax.jit, static_argnames=("velocity_fn", "num_steps",
                                             "sampler", "dynamic_cfg"))
def sample_latents(velocity_fn: Callable, x_init: jax.Array, rng: jax.Array,
                   num_steps: int, cfg_scale: float,
                   sampler: str = "euler", dynamic_cfg: bool = False,
                   ) -> jax.Array:
    """Run the flow ODE/SDE from t=1 noise to t≈0 latents.

    NOTE: `velocity_fn` typically closes over params; for large models use
    `make_sample_fn` instead, which threads params as a jit ARGUMENT (a
    closed-over 1.2B-param tree would be lowered as 5GB of constants).
    """
    return _scan_sampler(velocity_fn, x_init, rng, num_steps, cfg_scale,
                         sampler, dynamic_cfg)


def make_sample_fn(model, num_steps: int, sampler: str = "euler",
                   dynamic_cfg: bool = False) -> Callable:
    """Build a jitted sampler with params/conditioning as ARGUMENTS.

    Returns fn(params, x_init, text_hidden, text_pooled, rng, cfg_scale)
    -> final latents. text_* have batch == x_init batch.
    """

    def run(params, x_init, text_hidden, text_pooled, rng, cfg_scale):
        b = x_init.shape[0]
        null = jnp.concatenate([jnp.zeros((b,), bool), jnp.ones((b,), bool)])
        th2 = jnp.concatenate([text_hidden, text_hidden], axis=0)
        tp2 = jnp.concatenate([text_pooled, text_pooled], axis=0)

        def velocity(x, t, w):
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.full((2 * b,), t, jnp.float32)
            out = model.apply({"params": params}, x2, t2, th2, tp2,
                              null, null, null)
            if isinstance(out, tuple):
                out = out[0]
            return (1.0 + w) * out[:b] - w * out[b:]

        return _scan_sampler(velocity, x_init, rng, num_steps, cfg_scale,
                             sampler, dynamic_cfg)

    return jax.jit(run)


def sample_imgs(model, params, text_encoders, batch_size: int, num_steps: int,
                text_input, cfg_scale: float = 0.0, width: int = 256,
                height: int = 256, sampler: str = "euler",
                rng: jax.Array | None = None, decode: bool = True,
                save_intermediate: bool = False):
    """End-to-end text→image sampling (reference sample_imgs API).

    text_encoders: a TextEncoderSuite (models/text_encoders.py) providing
    `text_to_embedding` and `vae_decode`.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    k_init, k_samp = jax.random.split(rng)
    lat_ch = text_encoders.latent_channels
    # NOTE: the reference swaps width/height into (h, w) = (width, height)
    # (diff_model.py:375-377); we keep the sane orientation.
    x = jax.random.normal(k_init, (batch_size, lat_ch, height // 8, width // 8))

    text_hidden, text_pooled = text_encoders.text_to_embedding(text_input)
    if text_hidden.shape[0] == 1 and batch_size > 1:
        text_hidden = jnp.repeat(text_hidden, batch_size, axis=0)
        text_pooled = jnp.repeat(text_pooled, batch_size, axis=0)

    if not save_intermediate:
        fn = make_sample_fn(model, num_steps, sampler)
        lat = fn(params, x, text_hidden, text_pooled, k_samp,
                 jnp.float32(cfg_scale))
        return text_encoders.vae_decode(lat) if decode else lat

    vel = make_velocity_fn(model, params, text_hidden, text_pooled)

    # Intermediate decodes (GIF path) — stepwise, not scanned.
    imgs = []
    timesteps = jnp.linspace(1.0, 1.0 / num_steps, num_steps)
    dt = 1.0 / num_steps
    key = k_samp
    for t in timesteps:
        w = cfg_scale
        v = vel(x, t, w)
        if sampler == "euler":
            x = x - v * dt
        elif sampler == "euler_stochastic":
            sigma = (t * (1 - t) / (1 - t + 0.008))
            key, sub = jax.random.split(key)
            x = x - v * dt + sigma * jax.random.normal(sub, x.shape) * jnp.sqrt(dt)
        elif sampler == "heun":
            v2 = vel(x - v * dt, t - dt, w)
            x = x - (dt / 2.0) * (v + v2)
        imgs.append(text_encoders.vae_decode(x[:1]))
    out = text_encoders.vae_decode(x) if decode else x
    return out, imgs
