"""Fused Pallas backward parity vs autodiff-through-XLA gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from dimsum_tpu.ops.selective_scan import selective_scan_xla
from dimsum_tpu.ops.selective_scan_bwd import (
    selective_scan_bwd_pallas,
    selective_scan_fwd_train,
)


def make_inputs(rng, batch=2, L=64, dim=128, n=8):
    u = rng.standard_normal((batch, L, dim)).astype(np.float32)
    delta = (0.5 * rng.standard_normal((batch, L, dim))).astype(np.float32)
    A = -np.exp(rng.standard_normal((dim, n)).astype(np.float32) * 0.5)
    B = rng.standard_normal((batch, L, n)).astype(np.float32)
    C = rng.standard_normal((batch, L, n)).astype(np.float32)
    D = np.ones(dim, np.float32)
    z = rng.standard_normal((batch, L, dim)).astype(np.float32)
    bias = (0.1 * rng.standard_normal(dim)).astype(np.float32)
    return u, delta, A, B, C, D, z, bias


@pytest.mark.parametrize("L,chunk", [(64, 64), (128, 32)])
def test_fwd_train_matches_xla_and_boundaries(L, chunk):
    rng = np.random.default_rng(0)
    u, delta, A, B, C, D, z, bias = make_inputs(rng, L=L)
    with pltpu.force_tpu_interpret_mode():
        y, o, bnd = selective_scan_fwd_train(
            u, delta, A, B, C, D, z, bias, True, chunk=chunk, d_block=128)
    want = selective_scan_xla(u, delta, A, B, C, D, z, bias, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=2e-3, atol=1e-3)
    # o * silu(z) == y
    silu = z / (1 + np.exp(-z)) * 1.0
    silu = z * (1 / (1 + np.exp(-z)))
    np.testing.assert_allclose(np.asarray(o) * silu, np.asarray(want),
                               rtol=2e-3, atol=1e-3)
    assert bnd.shape == (2, L // chunk, 8, 128)
    # first chunk boundary is the zero initial state
    np.testing.assert_allclose(np.asarray(bnd[:, 0]), 0.0, atol=0)


@pytest.mark.parametrize("L,chunk", [(64, 64), (128, 32)])
def test_bwd_matches_autodiff(L, chunk):
    rng = np.random.default_rng(1)
    u, delta, A, B, C, D, z, bias = make_inputs(rng, L=L)
    g = rng.standard_normal(u.shape).astype(np.float32)

    def f(u_, d_, A_, B_, C_, D_, z_, b_):
        return selective_scan_xla(u_, d_, A_, B_, C_, D_, z_, b_, True)

    _, vjp = jax.vjp(f, u, delta, A, B, C, D, z, bias)
    want = vjp(jnp.asarray(g))

    with pltpu.force_tpu_interpret_mode():
        _, o, bnd = selective_scan_fwd_train(
            u, delta, A, B, C, D, z, bias, True, chunk=chunk, d_block=128)
        got = selective_scan_bwd_pallas(
            u, delta, A, B, C, D, z, bias, True, o, bnd,
            jnp.asarray(g), chunk=chunk, d_block=128)

    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dz", "dbias"]
    for name, w, g_ in zip(names, want, got):
        np.testing.assert_allclose(
            np.asarray(g_), np.asarray(w), rtol=5e-3, atol=5e-3,
            err_msg=f"grad mismatch: {name}")


def test_bwd_without_optionals():
    rng = np.random.default_rng(2)
    u, delta, A, B, C, _, _, _ = make_inputs(rng, L=64)
    g = rng.standard_normal(u.shape).astype(np.float32)

    def f(u_, d_, A_, B_, C_):
        return selective_scan_xla(u_, d_, A_, B_, C_, None, None, None, True)

    _, vjp = jax.vjp(f, u, delta, A, B, C)
    want = vjp(jnp.asarray(g))
    with pltpu.force_tpu_interpret_mode():
        _, o, bnd = selective_scan_fwd_train(
            u, delta, A, B, C, None, None, None, True, chunk=64, d_block=128)
        got = selective_scan_bwd_pallas(
            u, delta, A, B, C, None, None, None, True, o, bnd,
            jnp.asarray(g), chunk=64, d_block=128)
    for name, w, g_ in zip(["du", "ddelta", "dA", "dB", "dC"], want, got[:5]):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w),
                                   rtol=5e-3, atol=5e-3, err_msg=name)
    assert got[5] is None and got[6] is None and got[7] is None


def test_custom_vjp_end_to_end_interpret():
    """Grad through the public pallas dispatcher must match the XLA impl."""
    from dimsum_tpu.ops.selective_scan import selective_scan_pallas

    rng = np.random.default_rng(3)
    u, delta, A, B, C, D, z, bias = make_inputs(rng, L=64)

    def loss_pallas(*a):
        return jnp.sum(selective_scan_pallas(*a, delta_softplus=True) ** 2)

    def loss_xla(*a):
        return jnp.sum(selective_scan_xla(*a, delta_softplus=True) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5, 6, 7))(
            u, delta, A, B, C, D, z, bias)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4, 5, 6, 7))(
        u, delta, A, B, C, D, z, bias)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-2)


def test_dtlow_fused_matches_composition_interpret():
    """selective_scan_dtlow (in-kernel dt_proj expansion) == einsum + scan,
    forward and grads, interpret mode."""
    from dimsum_tpu.ops.selective_scan import _selective_scan_pallas_dtlow

    rng = np.random.default_rng(2)
    batch, L, dim, n, r = 2, 64, 128, 8, 24
    u, _, A, B, C, D, z, bias = make_inputs(rng, batch=batch, L=L, dim=dim,
                                            n=n)
    dt_low = (0.3 * rng.standard_normal((batch, L, r))).astype(np.float32)
    dt_w = (0.3 * rng.standard_normal((r, dim))).astype(np.float32)

    def ref(u_, dl_, w_):
        return selective_scan_xla(
            u_, jnp.einsum("blr,rd->bld", dl_, w_), A, B, C, D, z, bias,
            True)

    def fused(u_, dl_, w_):
        return _selective_scan_pallas_dtlow(
            u_, dl_, w_, A, B, C, D, z, bias, True)

    want = ref(u, dt_low, dt_w)
    with pltpu.force_tpu_interpret_mode():
        got = fused(u, dt_low, dt_w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-3)

    g = jnp.asarray(rng.standard_normal(u.shape).astype(np.float32))
    _, vjp_ref = jax.vjp(ref, u, dt_low, dt_w)
    with pltpu.force_tpu_interpret_mode():
        _, vjp_fused = jax.vjp(fused, u, dt_low, dt_w)
        got_g = vjp_fused(g)
    for a, b in zip(got_g, vjp_ref(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-3)


def test_dtlow_nonpallas_fallback_matches():
    """The impl='xla' fallback of selective_scan_dtlow is exactly the
    einsum composition (fast lane; no Pallas involved)."""
    from dimsum_tpu.ops.selective_scan import selective_scan_dtlow

    rng = np.random.default_rng(3)
    batch, L, dim, n, r = 2, 32, 64, 8, 8
    u, _, A, B, C, D, z, bias = make_inputs(rng, batch=batch, L=L, dim=dim,
                                            n=n)
    dt_low = (0.3 * rng.standard_normal((batch, L, r))).astype(np.float32)
    dt_w = (0.3 * rng.standard_normal((r, dim))).astype(np.float32)
    got = selective_scan_dtlow(u, dt_low, dt_w, A, B, C, D=D, z=z,
                               delta_bias=bias, delta_softplus=True,
                               impl="xla")
    want = selective_scan_xla(u, jnp.einsum("blr,rd->bld", dt_low, dt_w),
                              A, B, C, D, z, bias, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)
