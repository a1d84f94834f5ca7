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
