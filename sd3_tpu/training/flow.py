"""Rectified-flow objective and time sampling.

reference semantics:
- noising: x_t = (1-t)·x0 + t·ε                     (diff_model.noise_batch:229-241)
- target:  v = ε − x0                                (model_trainer.py:423-429)
- t ~ sigmoid(N(0,1)) ("logit-normal", TimeSampler.py:5-22)
- loss: MSE(v_pred, v), optional SD3 lognorm weighting (model_trainer.py:429-446)
- null-conditioning drops: independent Bernoulli masks for pooled/Gemma/BERT
  with probs 0.1/0.316/0.316 (train.py:50-55)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def sample_t(rng: jax.Array, n: int, weighted: bool = True,
             m: float = 0.0, s: float = 1.0) -> jax.Array:
    """Logit-normal (weighted=True) or uniform flow-time samples in (0,1)."""
    if weighted:
        u = jax.random.normal(rng, (n,)) * s + m
        return jax.nn.sigmoid(u)
    return jax.random.uniform(rng, (n,))


def noise_batch(rng: jax.Array, x0: jax.Array, t: jax.Array):
    """x_t = (1-t) x0 + t ε; returns (x_t, ε)."""
    eps = jax.random.normal(rng, x0.shape, x0.dtype)
    tb = t.reshape(-1, *([1] * (x0.ndim - 1))).astype(x0.dtype)
    return (1.0 - tb) * x0 + tb * eps, eps


def null_masks(rng: jax.Array, n: int, p_pooled: float = 0.1,
               p_gemma: float = 0.316, p_bert: float = 0.316):
    """Independent per-sample null-conditioning masks (True = drop)."""
    r1, r2, r3 = jax.random.split(rng, 3)
    return (jax.random.uniform(r1, (n,)) < p_pooled,
            jax.random.uniform(r2, (n,)) < p_gemma,
            jax.random.uniform(r3, (n,)) < p_bert)


def lognorm_weight(t: jax.Array, m: float = 0.0, s: float = 1.0) -> jax.Array:
    """SD3 lognorm loss weight (reference model_trainer.py:437-441)."""
    t = t.astype(jnp.float32)
    ln = (1.0 / (s * jnp.sqrt(2 * jnp.pi))) * (1.0 / (t * (1 - t))) * jnp.exp(
        -((jnp.log(t / (1 - t)) - m) ** 2) / (2 * s * s))
    return (t / (1 - t)) * ln


def velocity_loss(v_pred: jax.Array, x0: jax.Array, eps: jax.Array,
                  t: jax.Array | None = None, weigh_loss: bool = False) -> jax.Array:
    """MSE(v_pred, ε − x0), optionally lognorm-weighted per sample."""
    target = (eps - x0).astype(jnp.float32)
    err = jnp.square(v_pred.astype(jnp.float32) - target)
    if weigh_loss:
        assert t is not None
        per = jnp.mean(err.reshape(err.shape[0], -1), axis=1)
        return jnp.mean(per * lognorm_weight(t))
    return jnp.mean(err)


class TextLossBatch(NamedTuple):
    """Masked-text inputs/labels for the optional text-reconstruction loss
    (reference model_trainer.py:399-414)."""
    text_in: jax.Array     # masked text embeddings fed to the model
    labels: jax.Array      # original embeddings
    loss_mask: jax.Array   # (B, S) True where loss applies


def make_text_loss_batch(rng: jax.Array, text: jax.Array,
                         null_gemma: jax.Array, null_bert: jax.Array,
                         tokens_per_encoder: int,
                         percent_to_mask: float = 0.25) -> TextLossBatch:
    b, s, _ = text.shape
    tt = tokens_per_encoder
    probs = jax.random.uniform(rng, (b, s))
    mask = probs < percent_to_mask
    mask = mask.at[:, :tt].set(mask[:, :tt] & null_gemma[:, None])
    mask = mask.at[:, tt:].set(mask[:, tt:] & null_bert[:, None])
    return TextLossBatch(text * (~mask[:, :, None]), text, mask)


def text_recon_loss(txt_pred: jax.Array, batch: TextLossBatch) -> jax.Array:
    err = jnp.square(txt_pred.astype(jnp.float32) -
                     batch.labels.astype(jnp.float32))
    return jnp.mean(err * batch.loss_mask[:, :, None])
