"""adamw_low_mem (bf16 moment storage) vs optax adamw."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from sd3_tpu.training.optim import adamw_low_mem


def test_low_mem_adamw_tracks_adamw():
    lr = 1e-2
    ref = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    low = adamw_low_mem(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)

    params = {"w": jnp.asarray(np.random.default_rng(0).standard_normal(
        (8, 8), dtype=np.float32))}
    p_ref = params
    p_low = params
    s_ref = ref.init(p_ref)
    s_low = low.init(p_low)
    # bf16 storage check
    assert s_low.mu["w"].dtype == jnp.bfloat16
    assert s_low.nu["w"].dtype == jnp.bfloat16

    rng = np.random.default_rng(1)
    for _ in range(5):
        g = {"w": jnp.asarray(rng.standard_normal((8, 8), dtype=np.float32))}
        u_ref, s_ref = ref.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
        u_low, s_low = low.update(g, s_low, p_low)
        p_low = optax.apply_updates(p_low, u_low)

    # bf16 moments cost ~1e-2 relative drift over a few steps
    np.testing.assert_allclose(np.asarray(p_low["w"]), np.asarray(p_ref["w"]),
                               atol=5e-3, rtol=5e-2)


def test_low_mem_adamw_schedule_callable():
    sched = optax.linear_schedule(0.0, 1e-3, 10)
    low = adamw_low_mem(sched)
    params = {"w": jnp.ones((4,))}
    state = low.init(params)
    g = {"w": jnp.ones((4,))}
    u, state = low.update(g, state, params)
    # step 1: lr == sched(1)
    assert np.all(np.isfinite(np.asarray(u["w"])))
    assert state.count == 1


def test_low_mem_adamw_folded_clip_tracks_outer_clip():
    """clip_norm folded into adamw_low_mem matches an outer
    optax.clip_by_global_norm + adamw chain."""
    lr = 1e-2
    ref = optax.chain(optax.clip_by_global_norm(0.5),
                      optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                                  weight_decay=0.01))
    low = adamw_low_mem(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01,
                        clip_norm=0.5)
    params = {"w": jnp.asarray(np.random.default_rng(0).standard_normal(
        (8, 8), dtype=np.float32))}
    p_ref, p_low = params, params
    s_ref, s_low = ref.init(p_ref), low.init(p_low)
    rng = np.random.default_rng(1)
    for i in range(5):
        # alternate huge grads (clip engages) and tiny grads (clip inactive)
        scale = 100.0 if i % 2 == 0 else 1e-3
        g = {"w": jnp.asarray(
            scale * rng.standard_normal((8, 8), dtype=np.float32))}
        u_ref, s_ref = ref.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
        u_low, s_low = low.update(g, s_low, p_low)
        p_low = optax.apply_updates(p_low, u_low)
    np.testing.assert_allclose(np.asarray(p_low["w"]), np.asarray(p_ref["w"]),
                               atol=5e-3, rtol=5e-2)


def test_low_mem_adamw_accepts_bf16_grads():
    """bf16 grad trees update without dtype errors and stay close to fp32."""
    low = adamw_low_mem(1e-2, clip_norm=1.0)
    params = {"w": jnp.ones((16,), jnp.float32)}
    s16, s32 = low.init(params), low.init(params)
    g32 = {"w": jnp.full((16,), 0.123, jnp.float32)}
    g16 = {"w": g32["w"].astype(jnp.bfloat16)}
    u16, _ = low.update(g16, s16, params)
    u32, _ = low.update(g32, s32, params)
    assert u16["w"].dtype == jnp.float32  # updates in param dtype
    np.testing.assert_allclose(np.asarray(u16["w"]), np.asarray(u32["w"]),
                               rtol=1e-2, atol=1e-5)


def test_adamw_8bit_tracks_fused():
    """Blockwise-fp8 moments must track the bf16-moment fused update within
    quantization noise over several steps (large leaf -> quantized path,
    small leaf -> bf16 path)."""
    from sd3_tpu.training.optim import (adamw_8bit, fused_adamw_low_mem,
                                        Adam8bitState, QMIN)

    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.standard_normal((128, 64), dtype=np.float32)),
        "b": jnp.asarray(rng.standard_normal((32,), dtype=np.float32)),
    }
    assert params["w"].size >= QMIN and params["b"].size < QMIN
    i8, u8 = adamw_8bit(1e-2, clip_norm=1.0)
    ib, ub = fused_adamw_low_mem(1e-2, clip_norm=1.0)
    s8, sb = i8(params), ib(params)
    assert isinstance(s8, Adam8bitState)
    assert s8.mu_q["w"].dtype == jnp.float8_e4m3fn
    assert s8.mu_q["b"].dtype == jnp.bfloat16
    assert s8.mu_s["b"].size == 0

    p8 = pb = params
    for step in range(8):
        g = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.standard_normal(p.shape,
                                                      dtype=np.float32)),
            params)
        p8, s8, n8 = u8(g, s8, p8)
        pb, sb, nb = ub(g, sb, pb)
        np.testing.assert_allclose(float(n8), float(nb), rtol=1e-5)
    for k in params:
        np.testing.assert_allclose(np.asarray(p8[k]), np.asarray(pb[k]),
                                   atol=2e-2, rtol=8e-2)


def test_adamw_8bit_state_roundtrip():
    """dequantize_8bit/quantize_8bit round-trip (the checkpoint boundary)
    preserves moments to fp8 resolution and the count exactly."""
    from sd3_tpu.training.optim import (adamw_8bit, dequantize_8bit,
                                        quantize_8bit)

    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.standard_normal((80, 70),
                                                   dtype=np.float32)),
              "b": jnp.asarray(rng.standard_normal((8,), dtype=np.float32))}
    init, upd = adamw_8bit(1e-3)
    s = init(params)
    for _ in range(3):
        g = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.standard_normal(p.shape,
                                                      dtype=np.float32)), params)
        params, s, _ = upd(g, s, params)

    canon = dequantize_8bit(s, params)
    s2 = quantize_8bit(canon, params)
    assert int(s2.count) == int(s.count)
    for k in ("w", "b"):
        a = np.asarray(dequantize_8bit(s2, params).mu[k], np.float32)
        b = np.asarray(canon.mu[k], np.float32)
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=8e-2)
    # w: padded tail must not leak nonzero into the block layout
    assert s2.mu_q["w"].shape[1] == 256
