"""Flip-free reverse path: anticausal conv + reverse-time scan kernel.

The reference realizes reversed-scan blocks with literal sequence flips
(`/root/reference/dimsum/models_dim.py:1496-1507`); the TPU build runs the
reversed recurrence natively (no relayout).  These tests pin the semantics:
reverse == flip(forward(flip(.))) exactly.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from dimsum_tpu.ops.causal_conv1d import causal_conv1d
from dimsum_tpu.ops.selective_scan import (
    selective_scan_dtlow,
    selective_scan_xla,
    _selective_scan_pallas_dtlow,
)


def _flip(v):
    return None if v is None else jnp.flip(v, axis=1)


def make_inputs(rng, batch=2, L=64, dim=128, n=8, r=24):
    u = rng.standard_normal((batch, L, dim)).astype(np.float32)
    A = -np.exp(rng.standard_normal((dim, n)).astype(np.float32) * 0.5)
    B = rng.standard_normal((batch, L, n)).astype(np.float32)
    C = rng.standard_normal((batch, L, n)).astype(np.float32)
    D = np.ones(dim, np.float32)
    z = rng.standard_normal((batch, L, dim)).astype(np.float32)
    bias = (0.1 * rng.standard_normal(dim)).astype(np.float32)
    dt_low = (0.3 * rng.standard_normal((batch, L, r))).astype(np.float32)
    dt_w = (0.3 * rng.standard_normal((r, dim))).astype(np.float32)
    return u, A, B, C, D, z, bias, dt_low, dt_w


@pytest.mark.parametrize("width", [2, 3, 4])
def test_anticausal_conv_is_flipped_causal(width):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 37, 64)).astype(np.float32)
    w = rng.standard_normal((64, width)).astype(np.float32)
    b = rng.standard_normal(64).astype(np.float32)
    got = causal_conv1d(x, w, b, activation="silu", reverse=True)
    want = _flip(causal_conv1d(_flip(jnp.asarray(x)), w, b,
                               activation="silu"))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dtlow_reverse_xla_fallback_is_flip_composition():
    rng = np.random.default_rng(1)
    u, A, B, C, D, z, bias, dt_low, dt_w = make_inputs(rng)
    got = selective_scan_dtlow(u, dt_low, dt_w, A, B, C, D=D, z=z,
                               delta_bias=bias, delta_softplus=True,
                               impl="xla", reverse=True)
    want = _flip(selective_scan_xla(
        _flip(jnp.asarray(u)),
        jnp.einsum("blr,rd->bld", _flip(jnp.asarray(dt_low)), dt_w),
        A, _flip(jnp.asarray(B)), _flip(jnp.asarray(C)), D,
        _flip(jnp.asarray(z)), bias, True))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
@pytest.mark.parametrize("L,chunk", [(64, 64), (128, 32)])
def test_pallas_reverse_kernel_interpret(L, chunk, monkeypatch):
    """Native reverse-time kernel (incl. multi-chunk reversed carry) vs the
    flip composition through the XLA oracle."""
    monkeypatch.setenv("DIMSUM_SCAN_CHUNK", str(chunk))
    rng = np.random.default_rng(2)
    u, A, B, C, D, z, bias, dt_low, dt_w = make_inputs(rng, L=L)
    with pltpu.force_tpu_interpret_mode():
        got = _selective_scan_pallas_dtlow(
            u, dt_low, dt_w, A, B, C, D, z, bias, True, True)
    want = _flip(selective_scan_xla(
        _flip(jnp.asarray(u)),
        jnp.einsum("blr,rd->bld", _flip(jnp.asarray(dt_low)), dt_w),
        A, _flip(jnp.asarray(B)), _flip(jnp.asarray(C)), D,
        _flip(jnp.asarray(z)), bias, True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-3)


@pytest.mark.slow
def test_pallas_reverse_grads_interpret():
    """Grads through the reverse dtlow custom_vjp == grads of the explicit
    flip composition (the training path flips; values must agree)."""
    rng = np.random.default_rng(3)
    u, A, B, C, D, z, bias, dt_low, dt_w = make_inputs(rng, L=64)

    def ref(u_, dl_, w_, z_):
        return _flip(selective_scan_xla(
            _flip(u_), jnp.einsum("blr,rd->bld", _flip(dl_), w_),
            A, _flip(jnp.asarray(B)), _flip(jnp.asarray(C)), D,
            _flip(z_), bias, True))

    def fused(u_, dl_, w_, z_):
        return _selective_scan_pallas_dtlow(
            u_, dl_, w_, A, B, C, D, z_, bias, True, True)

    g = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32))
    _, vjp_ref = jax.vjp(ref, jnp.asarray(u), jnp.asarray(dt_low),
                         jnp.asarray(dt_w), jnp.asarray(z))
    with pltpu.force_tpu_interpret_mode():
        y, vjp_fused = jax.vjp(fused, jnp.asarray(u), jnp.asarray(dt_low),
                               jnp.asarray(dt_w), jnp.asarray(z))
        got_g = vjp_fused(g)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(ref(jnp.asarray(u),
                                              jnp.asarray(dt_low),
                                              jnp.asarray(dt_w),
                                              jnp.asarray(z))),
                               rtol=2e-3, atol=1e-3)
    for a, b in zip(got_g, vjp_ref(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-3)


def test_mixer_reverse_tokens_is_flip_composition():
    """Mamba(reverse_tokens=True) == flip(Mamba()(flip(x))) with shared
    params (CPU/XLA path -- internal flips -- must be bitwise)."""
    from dimsum_tpu.models.mamba import Mamba

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 36, 48)).astype(np.float32)
    fwd = Mamba(d_model=48, scan_impl="xla")
    rev = Mamba(d_model=48, scan_impl="xla", reverse_tokens=True)
    params = fwd.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = rev.apply(params, jnp.asarray(x))
    want = _flip(fwd.apply(params, _flip(jnp.asarray(x))))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mixer_reverse_tokens_v2_is_flip_composition():
    from dimsum_tpu.models.mamba import Mamba

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 36, 48)).astype(np.float32)
    fwd = Mamba(d_model=48, scan_impl="xla", scan_type="v2")
    rev = Mamba(d_model=48, scan_impl="xla", scan_type="v2",
                reverse_tokens=True)
    params = fwd.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = rev.apply(params, jnp.asarray(x))
    want = _flip(fwd.apply(params, _flip(jnp.asarray(x))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_block_reverse_native_matches_flip_path(monkeypatch):
    """MixerBlockCore(reverse=True) through the native in-mixer reverse ==
    the legacy explicit-flip path (forced via a zigzag-looking guard off)."""
    from dimsum_tpu.models import blocks as blk

    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 16, 48)).astype(np.float32)
    c = rng.standard_normal((2, 48)).astype(np.float32)
    core = blk.MixerBlockCore(
        dim=48, mixer_kwargs={"scan_impl": "xla"}, reverse=True,
        c_dim=48)
    monkeypatch.setenv("DIMSUM_NATIVE_REVERSE", "1")  # opt-in fast path
    params = core.init(jax.random.PRNGKey(0), jnp.asarray(x), None,
                       jnp.asarray(c))
    got, _ = core.apply(params, jnp.asarray(x), None, jnp.asarray(c))

    # legacy path: force the eligibility check off
    monkeypatch.setattr(blk, "_mixer_native_reverse_ok", lambda kw: False)
    want, _ = core.apply(params, jnp.asarray(x), None, jnp.asarray(c))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
