"""Model-level coverage of the softmax_flash path: the full MMDiT with the
pallas kernel must match the XLA softmax path (same params)."""

import numpy as np
import jax
import jax.numpy as jnp

from sd3_tpu.config import tiny_config
from sd3_tpu.models.mmdit import MMDiT, init_mmdit


def test_mmdit_flash_matches_softmax():
    # head_dim 128-friendly tiny config so the kernel path is realistic
    cfg = tiny_config(dim=128, num_heads=2, num_blocks=2)
    model_x = MMDiT(cfg.replace(attn_type="softmax"), remat_blocks=False)
    model_f = MMDiT(cfg.replace(attn_type="softmax_flash"), remat_blocks=False)
    _, params = init_mmdit(cfg.replace(attn_type="softmax"),
                           jax.random.PRNGKey(0))

    rng = jax.random.PRNGKey(1)
    ks = jax.random.split(rng, 4)
    b, hw = 2, cfg.max_res // 8
    x = jax.random.normal(ks[0], (b, cfg.inCh, hw, hw))
    t = jax.random.uniform(ks[1], (b,))
    c = jax.random.normal(ks[2], (b, cfg.text_tokens, cfg.text_hidden_dim))
    cp = jax.random.normal(ks[3], (b, cfg.class_dim))

    out_x = model_x.apply({"params": params}, x, t, c, cp)
    out_f = model_f.apply({"params": params}, x, t, c, cp)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=2e-4, rtol=2e-3)

    # gradients flow through the pallas custom VJP at the model level
    def loss(p):
        return jnp.mean(jnp.square(model_f.apply({"params": p}, x, t, c, cp)))
    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
