"""Fused conv+SiLU+x_proj kernel vs the unfused composition.

Oracle = conv_xproj_ref (causal_conv1d + XLA dot), itself parity-tested
against the reference's causal_conv1d_ref in test_ops.py.  Interpret mode
so the lane runs on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from dimsum_tpu.ops.conv_xproj import conv_xproj, conv_xproj_ref


def _inputs(key, B=2, L=64, D=256, W=4, R=96, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (B, L, D), dtype)
    conv_w = jax.random.normal(k2, (D, W), jnp.float32) * 0.3
    conv_b = jax.random.normal(k3, (D,), jnp.float32) * 0.1
    w_xp = jax.random.normal(k4, (D, R), jnp.float32) * (D ** -0.5)
    return x, conv_w, conv_b, w_xp


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_ref(reverse, dtype):
    x, conv_w, conv_b, w_xp = _inputs(jax.random.PRNGKey(0), dtype=dtype)
    with pltpu.force_tpu_interpret_mode():
        xc, xd = conv_xproj(x, conv_w, conv_b, w_xp, reverse)
    xc_r, xd_r = conv_xproj_ref(x, conv_w, conv_b, w_xp, reverse=reverse)
    assert xc.dtype == x.dtype and xd.dtype == jnp.float32
    ctol = 1e-6 if dtype == jnp.float32 else 1e-2  # fp32 FMA-order ULPs
    np.testing.assert_allclose(np.asarray(xc, np.float32),
                               np.asarray(xc_r, np.float32),
                               rtol=ctol, atol=ctol)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(xd), np.asarray(xd_r),
                               rtol=tol, atol=tol)


def test_multi_dblock_accumulation():
    # D=512 with DIMSUM_CONV_XPROJ_DBLOCK default 512 -> force 2 blocks
    import os
    os.environ["DIMSUM_CONV_XPROJ_DBLOCK"] = "256"
    try:
        x, conv_w, conv_b, w_xp = _inputs(jax.random.PRNGKey(1), D=512)
        with pltpu.force_tpu_interpret_mode():
            xc, xd = conv_xproj(x, conv_w, conv_b, w_xp, False)
        xc_r, xd_r = conv_xproj_ref(x, conv_w, conv_b, w_xp)
        np.testing.assert_allclose(np.asarray(xc), np.asarray(xc_r),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(xd), np.asarray(xd_r),
                                   rtol=1e-5, atol=1e-5)
    finally:
        del os.environ["DIMSUM_CONV_XPROJ_DBLOCK"]


def test_grads_match_ref():
    x, conv_w, conv_b, w_xp = _inputs(jax.random.PRNGKey(2), L=32, D=128)

    def loss_fused(*a):
        with pltpu.force_tpu_interpret_mode():
            xc, xd = conv_xproj(*a, False)
        return jnp.sum(xc * 0.5) + jnp.sum(xd ** 2)

    def loss_ref(*a):
        xc, xd = conv_xproj_ref(*a)
        return jnp.sum(xc * 0.5) + jnp.sum(xd ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, conv_w, conv_b, w_xp)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, conv_w, conv_b, w_xp)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_mixer_fused_path_matches_unfused(monkeypatch):
    """End-to-end through the Mamba mixer: DIMSUM_CONV_XPROJ=1 must leave
    outputs (and the param tree) equal to the stock path."""
    from dimsum_tpu.models.mamba import Mamba

    cfg = dict(d_model=128, d_state=16, d_conv=4, expand=2,
               scan_type="v2", scan_impl="ref")
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 128), jnp.float32)

    m = Mamba(**cfg)
    params = m.init(jax.random.PRNGKey(4), x)
    y_ref = m.apply(params, x)

    monkeypatch.setenv("DIMSUM_CONV_XPROJ", "1")
    with pltpu.force_tpu_interpret_mode():
        m2 = Mamba(**cfg)
        params2 = m2.init(jax.random.PRNGKey(4), x)
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(params2)
        y_fused = m2.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fused),
                               rtol=3e-5, atol=3e-5)
