"""Tests for inventory extras: image ops, HF converter, PE extras, augment."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dimsum_tpu.eval.image_ops import (
    bias_act, downsample2d, setup_filter, upfirdn2d, upsample2d,
)
from dimsum_tpu.models.pe_extras import (
    apply_vision_rotary, sinusoidal_pos_embed_1d, vision_rotary_freqs,
)
from dimsum_tpu.utils.augment import (
    bias_gelu, block_noise, gray_scale, solarize, three_augment,
)
from dimsum_tpu.utils.hf import convert_hf_mamba_state_dict


def test_bias_act_variants():
    x = jnp.array([[-1.0, 0.5]])
    b = jnp.array([0.5, 0.0])
    np.testing.assert_allclose(
        bias_act(x, b, dim=1, act="relu"),
        np.maximum([[-0.5, 0.5]], 0) * np.sqrt(2), rtol=1e-6)
    np.testing.assert_allclose(
        bias_act(x, act="lrelu", alpha=0.1)[0, 0], -0.1 * np.sqrt(2),
        rtol=1e-5)
    assert float(bias_act(x, act="linear", clamp=0.3).max()) <= 0.3 + 1e-6


def test_upfirdn2d_identity_and_shapes():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 8, 8)),
                    jnp.float32)
    # identity: delta filter, no resampling
    ident = upfirdn2d(x, jnp.ones((1, 1)))
    np.testing.assert_allclose(np.asarray(ident), np.asarray(x), rtol=1e-6)
    f = setup_filter([1, 3, 3, 1])
    up = upsample2d(x, f)
    assert up.shape == (1, 2, 16, 16)
    down = downsample2d(x, f)
    assert down.shape == (1, 2, 4, 4)
    # box downsample of a constant stays constant
    const = jnp.ones((1, 1, 8, 8))
    d = downsample2d(const, setup_filter([1, 1]))
    np.testing.assert_allclose(np.asarray(d), 1.0, rtol=1e-6)


def test_upsample_preserves_interior_values():
    x = jnp.ones((1, 1, 4, 4)) * 3.0
    f = setup_filter([1, 3, 3, 1])
    up = upsample2d(x, f)
    # interior is exactly the constant (edges attenuate under zero-pad FIR)
    np.testing.assert_allclose(np.asarray(up)[0, 0, 2:-2, 2:-2], 3.0,
                               rtol=1e-5)


def test_hf_mamba_converter_drives_model():
    from dimsum_tpu.models.lm import MambaLMConfig, MambaLMHeadModel

    d, n_layer, vocab = 32, 2, 40
    d_inner, R, N, W = 2 * d, 2, 16, 4
    rng = np.random.default_rng(0)

    def r(*s):
        return (0.05 * rng.standard_normal(s)).astype(np.float32)

    sd = {"backbone.embedding.weight": r(vocab, d),
          "backbone.norm_f.weight": np.ones(d, np.float32),
          "lm_head.weight": r(vocab, d)}
    for i in range(n_layer):
        p = f"backbone.layers.{i}"
        sd.update({
            f"{p}.norm.weight": np.ones(d, np.float32),
            f"{p}.mixer.in_proj.weight": r(2 * d_inner, d),
            f"{p}.mixer.conv1d.weight": r(d_inner, 1, W),
            f"{p}.mixer.conv1d.bias": r(d_inner),
            f"{p}.mixer.x_proj.weight": r(R + 2 * N, d_inner),
            f"{p}.mixer.dt_proj.weight": r(d_inner, R),
            f"{p}.mixer.dt_proj.bias": r(d_inner),
            f"{p}.mixer.A_log": r(d_inner, N),
            f"{p}.mixer.D": np.ones(d_inner, np.float32),
            f"{p}.mixer.out_proj.weight": r(d, d_inner),
        })
    params = convert_hf_mamba_state_dict(sd)
    cfg = MambaLMConfig(d_model=d, n_layer=n_layer, vocab_size=vocab,
                        pad_vocab_size_multiple=1, scan_impl="xla")
    model = MambaLMHeadModel(cfg)
    ids = jnp.arange(6).reshape(1, 6)
    template = model.init(jax.random.PRNGKey(0), ids)["params"]
    # structural match
    t_keys = set(jax.tree_util.tree_flatten_with_path(template)[0][i][0].__str__()
                 for i in range(len(jax.tree.leaves(template))))
    g_keys = set(jax.tree_util.tree_flatten_with_path(params)[0][i][0].__str__()
                 for i in range(len(jax.tree.leaves(params))))
    assert t_keys == g_keys, (sorted(t_keys - g_keys),
                              sorted(g_keys - t_keys))
    logits = model.apply({"params": params}, ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_vision_rotary():
    cos, sin = vision_rotary_freqs(32, pt_seq_len=4)
    assert cos.shape == (16, 32)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16, 32)),
                    jnp.float32)
    out = apply_vision_rotary(x, cos, sin)
    # rotation preserves pairwise norms
    def pair_norms(v):
        v = np.asarray(v).reshape(2, 16, 16, 2)
        return np.linalg.norm(v, axis=-1)
    np.testing.assert_allclose(pair_norms(out), pair_norms(x), rtol=1e-4)


def test_sinusoidal_1d():
    pe = sinusoidal_pos_embed_1d(10, 16)
    assert pe.shape == (10, 16)
    np.testing.assert_allclose(np.asarray(pe[0, 0::2]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pe[0, 1::2]), 1.0, atol=1e-7)


def test_augment_ops():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    g = gray_scale(img)
    assert (g[..., 0] == g[..., 1]).all()
    s = solarize(img)
    assert s.dtype == np.uint8
    out = three_augment(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_bias_gelu_matches_jax():
    x = jnp.linspace(-3, 3, 32).reshape(4, 8)
    b = jnp.ones(8) * 0.1
    np.testing.assert_allclose(
        np.asarray(bias_gelu(b, x)),
        np.asarray(jax.nn.gelu(x + b, approximate=True)), rtol=1e-4,
        atol=1e-5)


def test_gelu_back_matches_autodiff():
    """The hand-derived backward (reference bias_gelu.py autograd fn) must
    equal jax.vjp of the forward."""
    from dimsum_tpu.utils.augment import gelu_back

    x = jnp.linspace(-3.0, 3.0, 32).reshape(4, 8)
    b = jnp.linspace(-0.2, 0.2, 8)
    g = jnp.cos(x)  # arbitrary cotangent
    _, vjp = jax.vjp(lambda y: bias_gelu(b, y), x)
    np.testing.assert_allclose(np.asarray(gelu_back(g, b, x)),
                               np.asarray(vjp(g)[0]), rtol=1e-4, atol=1e-5)


def test_block_noise_std():
    k = jax.random.PRNGKey(0)
    n = block_noise(k, (4, 1, 32, 32), block_size=2)
    # normalized to roughly unit std
    assert 0.7 < float(jnp.std(n)) < 1.3
    n1 = block_noise(k, (4, 1, 32, 32), block_size=1)
    assert n1.shape == (4, 1, 32, 32)
