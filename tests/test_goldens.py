"""Golden regression tests: fixed-seed tiny-model outputs pinned to stored
arrays.  These catch accidental semantic drift in the block wiring across
refactors (shapes/tolerances alone would not)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "model_outputs.npz")


def _params_plus(model, key, *args):
    params = model.init(key, *args)
    return jax.tree.map(lambda a: a + 0.01, params)


def test_dim_combined_golden():
    from dimsum_tpu.models.dim import DiM, DiMConfig

    cfg = DiMConfig(img_resolution=16, patch_size=2, hidden_size=64, depth=2,
                    num_classes=10, rms_norm=True, block_type="combined",
                    cond_mamba=True, learnable_pe=True,
                    use_attn_every_k_layers=2, scan_impl="xla")
    model = DiM(cfg)
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 4, 16, 16))
    t = jnp.array([0.25, 0.75])
    y = jnp.array([3, 7])
    params = _params_plus(model, jax.random.PRNGKey(11), x, t, y)
    out = np.asarray(model.apply(params, x, t, y))
    want = np.load(GOLDEN)["dim_out"]
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_dit_golden():
    from dimsum_tpu.models.dit import DiT, DiTConfig

    cfg = DiTConfig(img_resolution=16, patch_size=2, hidden_size=64, depth=2,
                    num_heads=4, num_classes=10)
    model = DiT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 4, 16, 16))
    t = jnp.array([0.25, 0.75])
    y = jnp.array([3, 7])
    params = _params_plus(model, jax.random.PRNGKey(12), x, t, y)
    out = np.asarray(model.apply(params, x, t, y))
    want = np.load(GOLDEN)["dit_out"]
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)
