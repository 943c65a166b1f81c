"""Fused on-device decode->uint8->InceptionV3 features (sample_ddp.py
streaming fast path) vs the unfused decode -> host uint8 -> detector
chain: the uint8 quantization is the same jnp op in both, so features must
match (only the host round-trip disappears)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_fused_decode_features_match():
    import jax
    import jax.numpy as jnp

    from dimsum_tpu.eval.features import make_detector
    from dimsum_tpu.eval.inception import preprocess_uint8
    from dimsum_tpu.models.vae import load_vae

    vae, vae_params = load_vae("random")
    det = make_detector("jax-random")

    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8), jnp.float32)

    # unfused: decode -> uint8 on device -> host -> detector (the
    # uint8_batches path)
    @jax.jit
    def decode_u8(z):
        img = vae.apply(vae_params, z, method=vae.decode)
        return jnp.clip((img + 1) * 127.5, 0, 255).astype(jnp.uint8)

    u8_host = np.asarray(decode_u8(z))
    feats_unfused = det(u8_host)

    # fused: one jitted program, only features leave the device
    @jax.jit
    def decode_feats(z):
        img = vae.apply(vae_params, z, method=vae.decode)
        u8 = jnp.clip((img + 1) * 127.5, 0, 255).astype(jnp.uint8)
        return det.model.apply({"params": det.params}, preprocess_uint8(u8))

    feats_fused = np.asarray(decode_feats(z))
    assert feats_fused.shape == feats_unfused.shape == (2, 2048)
    np.testing.assert_allclose(feats_fused, feats_unfused,
                               rtol=1e-4, atol=1e-5)
