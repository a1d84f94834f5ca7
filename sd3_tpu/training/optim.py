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


def fused_adamw_low_mem(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=0.01, state_dtype=jnp.bfloat16,
                        clip_norm=None):
    """Single-pass fused AdamW over the parameter TREE (bf16 moments, fp32
    math), applying the update in place instead of returning an optax
    updates tree.

    Why this exists: the optax-shaped `adamw_low_mem` + `apply_updates`
    measured 128 ms/step on the 1.2B model (scripts/train_probe.py, 256px
    b16) against a ~27 ms HBM roofline. The structural cost is TRAFFIC, not
    just dispatch: optax's update/apply split materializes a full fp32
    updates tree (5GB written + re-read on 1.2B params) and the mu/nu
    recomputation adds two more passes over the gradients — ~52GB moved
    where one fused pass needs ~22.5GB. Producing (new_p, new_mu, new_nu)
    per leaf in ONE multi-output fusion removes the extra passes; XLA fuses
    the per-leaf chain into a single kernel with three outputs.

    MEASURED DEAD ENDS (round 3, don't redo): re-laying the masters/moments
    out as flat vectors — one (N,) vector or per-block (P,) buckets — to cut
    kernel count further. Both OOM the 16G chip at 256px b16: the (P,)
    linear <-> (in,out) tiled layout mismatch makes every param view a real
    copy, and the grad-tree -> vector concat (or scatter-VJP chain) co-lives
    with the grad tree at the end of the backward (+2.5GB where the budget
    has none). Tree-form leaves keep XLA's per-leaf liveness; the single
    fused pass already removes ~2/3 of the update's HBM traffic.

    Update math is element-for-element identical to `adamw_low_mem` (same
    clip folding, same bf16 moment round-trip), and the state is the same
    `AdamWLowMemState` — checkpoints interchange freely with the optax path.

    Returns (init, update) where
      init(params)                 -> AdamWLowMemState
      update(grads, state, params) -> (new_params, new_state, grad_norm)
    """

    def init(params):
        zeros = lambda p: jnp.zeros(p.shape, state_dtype)
        return AdamWLowMemState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params))

    def update(grads, state, params):
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        gnorm = global_norm_f32(grads)
        if clip_norm is not None:
            scale = jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-12))
        else:
            scale = jnp.float32(1.0)
        cf = count.astype(jnp.float32)

        def upd(g, mu, nu, p):
            gf = g.astype(jnp.float32) * scale
            mu_f = b1 * mu.astype(jnp.float32) + (1 - b1) * gf
            nu_f = b2 * nu.astype(jnp.float32) + (1 - b2) * gf * gf
            mu_hat = mu_f / (1 - b1 ** cf)
            nu_hat = nu_f / (1 - b2 ** cf)
            pf = p.astype(jnp.float32)
            step = mu_hat / (jnp.sqrt(nu_hat) + eps) + weight_decay * pf
            return ((pf - lr * step).astype(p.dtype),
                    mu_f.astype(state_dtype), nu_f.astype(state_dtype))

        out = jax.tree_util.tree_map(
            lambda g, mu, nu, p: upd(g, mu, nu, p),
            grads, state.mu, state.nu, params)
        # out is a tree of (p, mu, nu) TUPLES; transpose to three trees
        new_p = jax.tree_util.tree_map(lambda t: t[0], out,
                                       is_leaf=lambda t: isinstance(t, tuple))
        new_mu = jax.tree_util.tree_map(lambda t: t[1], out,
                                        is_leaf=lambda t: isinstance(t, tuple))
        new_nu = jax.tree_util.tree_map(lambda t: t[2], out,
                                        is_leaf=lambda t: isinstance(t, tuple))
        return new_p, AdamWLowMemState(count, new_mu, new_nu), gnorm

    return init, update


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
