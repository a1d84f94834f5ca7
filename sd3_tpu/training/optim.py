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

    Why this exists: one multi-output fusion per leaf producing
    (new_p, new_mu, new_nu) is the minimal-traffic update (~22.5GB/step on
    1.2B vs ~42.5GB for optax's update/apply split with its materialized
    fp32 updates tree). MEASURED CAVEAT (round 3, scripts/opt_probe.py,
    pipelined timing): XLA optimizes the optax chain well enough that both
    land at ~43-44 ms isolated — the earlier "128ms optax update" was the
    ~35ms axon dispatch RTT double-billed (scripts/rtt_probe.py). The fused
    form is kept as the default for its in-place API (no updates tree ever
    exists, even transiently) and as the base of the 8-bit variant below.

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


class Adam8bitState(NamedTuple):
    """Blockwise-quantized Adam moments: per leaf, `*_q` holds fp8-e4m3
    values shaped (n_blocks, QBLOCK) and `*_s` the per-block fp32 absmax
    scales shaped (n_blocks, 1). Leaves smaller than QMIN elements stay
    bfloat16, marked by a zero-size `*_s` entry (a real leaf — `None` would
    not survive tree_map across mixed trees)."""
    count: jax.Array
    mu_q: optax.Updates
    mu_s: optax.Updates
    nu_q: optax.Updates
    nu_s: optax.Updates


QBLOCK = 256   # quantization block (absmax shared by QBLOCK elements)
QMIN = 4096    # leaves below this stay bf16 (biases/norms: negligible bytes)
_F8MAX = 448.0  # e4m3 max finite


def _blockify(x32):
    n = x32.size
    nb = -(-n // QBLOCK)
    xp = jnp.pad(x32.reshape(-1), (0, nb * QBLOCK - n))
    return xp.reshape(nb, QBLOCK)


def _unblockify(xb, shape):
    n = 1
    for d in shape:
        n *= d
    return xb.reshape(-1)[:n].reshape(shape)


def _q8(xb):
    s = jnp.maximum(jnp.max(jnp.abs(xb), axis=1, keepdims=True), 1e-20) \
        / _F8MAX
    return (xb / s).astype(jnp.float8_e4m3fn), s


def _dq8(q, s):
    return q.astype(jnp.float32) * s


def adamw_8bit(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
               weight_decay=0.01, clip_norm=None):
    """AdamW with both moments stored as blockwise fp8-e4m3 (bnb-style
    8-bit Adam, TPU-idiomatic: everything is one fused elementwise pass per
    leaf — quantize/dequantize are VPU converts riding the same HBM
    streams, no lookup tables).

    vs `fused_adamw_low_mem` (bf16 moments): moment storage drops 5GB ->
    ~2.5GB on the 1.2B model — the freed 2.5GB is exactly the
    grad-accumulation carry that did not fit at 256px b16 — and update
    HBM traffic drops 22.5GB -> ~17.5GB/step. fp8-e4m3 with per-256-block
    absmax scales keeps RELATIVE moment error <=6% across a 2^18 dynamic
    range per block (linear int8 would put 40%+ relative error on
    small-magnitude second moments — the denominator — within mixed
    blocks). Reference parallel: the torch reference trains bf16 AMP with
    fp32 Adam state on 80GB A100s (model_trainer.py optimizer setup); this
    is the 16GB-chip equivalent, with the same update math in fp32.

    Returns (init, update) like `fused_adamw_low_mem`:
      init(params)                 -> Adam8bitState
      update(grads, state, params) -> (new_params, new_state, grad_norm)
    """

    def _small(p):
        return p.size < QMIN

    def init(params):
        def zq(p):
            if _small(p):
                return jnp.zeros(p.shape, jnp.bfloat16)
            nb = -(-p.size // QBLOCK)
            return jnp.zeros((nb, QBLOCK), jnp.float8_e4m3fn)

        def zs(p):
            if _small(p):
                return jnp.zeros((0,), jnp.float32)
            nb = -(-p.size // QBLOCK)
            return jnp.zeros((nb, 1), jnp.float32)

        tm = jax.tree_util.tree_map
        return Adam8bitState(count=jnp.zeros((), jnp.int32),
                             mu_q=tm(zq, params), mu_s=tm(zs, params),
                             nu_q=tm(zq, params), nu_s=tm(zs, params))

    def update(grads, state, params):
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        gnorm = global_norm_f32(grads)
        if clip_norm is not None:
            scale = jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-12))
        else:
            scale = jnp.float32(1.0)
        cf = count.astype(jnp.float32)
        c1 = 1 - b1 ** cf
        c2 = 1 - b2 ** cf

        def upd(g, p, mu_q, mu_s, nu_q, nu_s):
            gf = g.astype(jnp.float32) * scale
            if mu_s.size == 0:  # small leaf: bf16 moments, same math
                mu = b1 * mu_q.astype(jnp.float32) + (1 - b1) * gf
                nu = b2 * nu_q.astype(jnp.float32) + (1 - b2) * gf * gf
                pf = p.astype(jnp.float32)
                step = (mu / c1) / (jnp.sqrt(nu / c2) + eps) \
                    + weight_decay * pf
                return ((pf - lr * step).astype(p.dtype),
                        mu.astype(jnp.bfloat16), mu_s,
                        nu.astype(jnp.bfloat16), nu_s)
            gb = _blockify(gf)
            mu = b1 * _dq8(mu_q, mu_s) + (1 - b1) * gb
            nu = b2 * _dq8(nu_q, nu_s) + (1 - b2) * gb * gb
            step_b = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
            pf = p.astype(jnp.float32)
            step = _unblockify(step_b, p.shape) + weight_decay * pf
            mq, ms = _q8(mu)
            nq, ns = _q8(nu)
            return (pf - lr * step).astype(p.dtype), mq, ms, nq, ns

        tm = jax.tree_util.tree_map
        out = tm(upd, grads, params, state.mu_q,
                 state.mu_s, state.nu_q, state.nu_s)
        tup = lambda t: isinstance(t, tuple)
        pick = lambda i: tm(lambda t: t[i], out, is_leaf=tup)
        return pick(0), Adam8bitState(count, pick(1), pick(2),
                                      pick(3), pick(4)), gnorm

    return init, update


def dequantize_8bit(state: "Adam8bitState", params) -> AdamWLowMemState:
    """Adam8bitState -> the canonical bf16 AdamWLowMemState, leaves shaped
    like `params`. Checkpoints ALWAYS store this canonical form, so 8-bit,
    bf16-fused and optax trainers all resume from each other's optim
    artifacts (re-quantization on resume costs one absmax round-trip)."""
    def dq(q, s, p):
        if s.size == 0:
            return q  # small leaf: already bf16, param-shaped
        return _unblockify(_dq8(q, s), p.shape).astype(jnp.bfloat16)

    tm = jax.tree_util.tree_map
    return AdamWLowMemState(state.count,
                            tm(dq, state.mu_q, state.mu_s, params),
                            tm(dq, state.nu_q, state.nu_s, params))


def quantize_8bit(state: AdamWLowMemState, params) -> "Adam8bitState":
    """Inverse of `dequantize_8bit` (used when resuming an 8-bit trainer
    from the canonical on-disk artifact)."""
    def qq(m, p):
        if p.size < QMIN:
            return (jnp.asarray(m).astype(jnp.bfloat16),
                    jnp.zeros((0,), jnp.float32))
        return _q8(_blockify(jnp.asarray(m).astype(jnp.float32)))

    tm = jax.tree_util.tree_map
    tup = lambda t: isinstance(t, tuple)
    mu = tm(qq, state.mu, params)
    nu = tm(qq, state.nu, params)
    pick = lambda tree, i: tm(lambda t: t[i], tree, is_leaf=tup)
    return Adam8bitState(jnp.asarray(state.count),
                         pick(mu, 0), pick(mu, 1),
                         pick(nu, 0), pick(nu, 1))


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
