"""Optimizers.

`adamw(...)` — standard optax AdamW (reference hyperparameters).
`adamw_low_mem(...)` — AdamW with BOTH moments stored in bfloat16 (updates
computed in fp32). Halves optimizer memory: 1.2B-param training then fits a
single 16GB v5e chip (fp32 params 4.8G + m 2.4G + v 2.4G), where fp32 moments
need >19G. Sharded the same way as params by the GSPMD rules.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdamWLowMemState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def global_norm_f32(tree) -> jax.Array:
    """Global L2 norm with per-leaf fp32 upcast (safe for bf16 grad trees —
    the squares/reductions are transient, no fp32 tree materializes)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def adamw_low_mem(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                  weight_decay=0.01, state_dtype=jnp.bfloat16,
                  clip_norm=None) -> optax.GradientTransformation:
    """AdamW with low-precision moment storage (fp32 math).

    `clip_norm` folds global-norm clipping INTO the update (the clip scale
    multiplies the per-leaf fp32 upcast) instead of an outer
    optax.clip_by_global_norm — an outer clip would promote a bf16 grad tree
    to fp32 between the two transforms, re-materializing the tree this
    optimizer exists to avoid.
    """

    def init(params):
        zeros = lambda p: jnp.zeros(p.shape, state_dtype)
        return AdamWLowMemState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(grads, state, params):
        assert params is not None, "adamw_low_mem needs params (weight decay)"
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        if clip_norm is not None:
            gnorm = global_norm_f32(grads)
            # optax.clip_by_global_norm semantics: scale only when over
            scale = jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-12))
        else:
            scale = jnp.float32(1.0)

        def moments(g, mu, nu):
            gf = g.astype(jnp.float32) * scale
            mu_f = b1 * mu.astype(jnp.float32) + (1 - b1) * gf
            nu_f = b2 * nu.astype(jnp.float32) + (1 - b2) * gf * gf
            return mu_f, nu_f

        def upd(g, mu, nu, p):
            mu_f, nu_f = moments(g, mu, nu)
            mu_hat = mu_f / (1 - b1 ** count.astype(jnp.float32))
            nu_hat = nu_f / (1 - b2 ** count.astype(jnp.float32))
            step = mu_hat / (jnp.sqrt(nu_hat) + eps)
            step = step + weight_decay * p.astype(jnp.float32)
            return (-lr * step).astype(p.dtype)

        updates = jax.tree_util.tree_map(upd, grads, state.mu, state.nu, params)
        new_mu = jax.tree_util.tree_map(
            lambda g, mu: moments(g, mu, mu)[0].astype(state_dtype),
            grads, state.mu)
        # recompute nu (cheap elementwise; avoids carrying fp32 temporaries)
        new_nu = jax.tree_util.tree_map(
            lambda g, nu: (b2 * nu.astype(jnp.float32) +
                           (1 - b2) * jnp.square(g.astype(jnp.float32) * scale)
                           ).astype(state_dtype),
            grads, state.nu)
        return updates, AdamWLowMemState(count, new_mu, new_nu)

    return optax.GradientTransformation(init, update)
