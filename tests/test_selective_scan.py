"""Parity tests for the selective scan, mirroring the reference test matrix
(`/root/reference/mamba/tests/ops/test_selective_scan.py`): fwd outputs and
grads vs a numpy oracle, over seqlens / dtypes / optional args."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dimsum_tpu.ops.selective_scan import (
    selective_scan_ref,
    selective_scan_xla,
    selective_scan_pallas,
    selective_state_update,
)


def numpy_oracle(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                 delta_softplus=False):
    """Direct numpy port of the reference math (selective_scan_ref:104),
    adapted to (B, L, D) layout."""
    u = np.asarray(u, np.float64)
    dt = np.asarray(delta, np.float64)
    if delta_bias is not None:
        dt = dt + np.asarray(delta_bias, np.float64)[None, None, :]
    if delta_softplus:
        dt = np.logaddexp(0.0, dt)
    A = np.asarray(A, np.float64)
    Bm = np.asarray(B, np.float64)
    Cm = np.asarray(C, np.float64)
    batch, L, dim = u.shape
    n = A.shape[1]
    h = np.zeros((batch, dim, n))
    ys = np.zeros((batch, L, dim))
    for t in range(L):
        da = np.exp(dt[:, t, :, None] * A[None])             # (B, D, N)
        dbu = dt[:, t, :, None] * Bm[:, t, None, :] * u[:, t, :, None]
        h = da * h + dbu
        ys[:, t] = np.einsum("bdn,bn->bd", h, Cm[:, t])
    if D is not None:
        ys = ys + u * np.asarray(D, np.float64)[None, None, :]
    if z is not None:
        zf = np.asarray(z, np.float64)
        ys = ys * (zf / (1 + np.exp(-zf)))
    return ys, h


def make_inputs(rng, batch=2, L=64, dim=16, n=8, dtype=np.float32,
                with_d=True, with_z=True, with_bias=True):
    u = rng.standard_normal((batch, L, dim)).astype(dtype)
    delta = (0.5 * rng.standard_normal((batch, L, dim))).astype(dtype)
    A = -np.exp(rng.standard_normal((dim, n)).astype(np.float32) * 0.5)
    B = rng.standard_normal((batch, L, n)).astype(dtype)
    C = rng.standard_normal((batch, L, n)).astype(dtype)
    D = np.ones(dim, np.float32) if with_d else None
    z = rng.standard_normal((batch, L, dim)).astype(dtype) if with_z else None
    bias = (0.1 * rng.standard_normal(dim)).astype(np.float32) if with_bias else None
    return u, delta, A, B, C, D, z, bias


@pytest.mark.parametrize("L", [8, 64, 130])
@pytest.mark.parametrize("with_z", [True, False])
@pytest.mark.parametrize("with_d", [True, False])
def test_ref_matches_numpy(L, with_z, with_d):
    rng = np.random.default_rng(0)
    u, delta, A, B, C, D, z, bias = make_inputs(
        rng, L=L, with_z=with_z, with_d=with_d
    )
    want, want_h = numpy_oracle(u, delta, A, B, C, D, z, bias, True)
    got, got_h = selective_scan_ref(
        u, delta, A, B, C, D, z, bias, delta_softplus=True,
        return_last_state=True,
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(got_h, want_h, rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("L", [8, 64, 256])
def test_xla_matches_ref(L):
    rng = np.random.default_rng(1)
    u, delta, A, B, C, D, z, bias = make_inputs(rng, L=L)
    want = selective_scan_ref(u, delta, A, B, C, D, z, bias, True)
    got, last = selective_scan_xla(
        u, delta, A, B, C, D, z, bias, True, return_last_state=True
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)
    _, want_h = numpy_oracle(u, delta, A, B, C, D, z, bias, True)
    np.testing.assert_allclose(last, want_h, rtol=2e-3, atol=1e-3)


def test_xla_grads_match_ref_grads():
    rng = np.random.default_rng(2)
    u, delta, A, B, C, D, z, bias = make_inputs(rng, L=32, dim=8, n=4)

    def loss(fn, *args):
        return jnp.sum(fn(*args, delta_softplus=True) ** 2)

    g_ref = jax.grad(lambda *a: loss(selective_scan_ref, *a),
                     argnums=(0, 1, 2, 3, 4, 5, 6, 7))(
        u, delta, A, B, C, D, z, bias)
    g_xla = jax.grad(lambda *a: loss(selective_scan_xla, *a),
                     argnums=(0, 1, 2, 3, 4, 5, 6, 7))(
        u, delta, A, B, C, D, z, bias)
    for a, b in zip(g_ref, g_xla):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-3)


def test_pallas_interpret_matches_ref():
    """Run the Pallas kernel in interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    u, delta, A, B, C, D, z, bias = make_inputs(
        rng, batch=2, L=64, dim=128, n=8
    )
    want = selective_scan_ref(u, delta, A, B, C, D, z, bias, True)
    with pltpu.force_tpu_interpret_mode():
        got = selective_scan_pallas(u, delta, A, B, C, D, z, bias, True)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_pallas_interpret_multichunk_carry():
    """L spans several chunks: the carried state must flow across them."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(4)
    u, delta, A, B, C, D, z, bias = make_inputs(
        rng, batch=1, L=512, dim=128, n=8
    )
    want = selective_scan_ref(u, delta, A, B, C, D, z, bias, True)
    with pltpu.force_tpu_interpret_mode():
        got = selective_scan_pallas(u, delta, A, B, C, D, z, bias, True)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_bf16_tolerance():
    rng = np.random.default_rng(5)
    u, delta, A, B, C, D, z, bias = make_inputs(rng, L=64, dim=32, n=8)
    want = selective_scan_ref(u, delta, A, B, C, D, z, bias, True)
    got = selective_scan_xla(
        u.astype(jnp.bfloat16), delta.astype(jnp.bfloat16), A,
        B.astype(jnp.bfloat16), C.astype(jnp.bfloat16), D,
        z.astype(jnp.bfloat16), bias, True,
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), want, rtol=5e-2, atol=5e-2
    )


def test_state_update_matches_scan_step():
    rng = np.random.default_rng(6)
    batch, dim, n = 2, 16, 8
    state = rng.standard_normal((batch, dim, n)).astype(np.float32)
    x = rng.standard_normal((batch, dim)).astype(np.float32)
    dt = rng.standard_normal((batch, dim)).astype(np.float32)
    A = -np.exp(rng.standard_normal((dim, n)).astype(np.float32))
    B = rng.standard_normal((batch, n)).astype(np.float32)
    C = rng.standard_normal((batch, n)).astype(np.float32)
    D = np.ones(dim, np.float32)
    z = rng.standard_normal((batch, dim)).astype(np.float32)
    bias = np.zeros(dim, np.float32)

    y, new_state = selective_state_update(
        state, x, dt, A, B, C, D, z, bias, dt_softplus=True
    )
    # oracle: one scan step
    dtf = np.logaddexp(0, dt)
    dA = np.exp(dtf[..., None] * A[None])
    want_state = state * dA + x[..., None] * (dtf[..., None] * B[:, None, :])
    want_y = np.einsum("bdn,bn->bd", want_state, C) + D * x
    want_y = want_y * (z / (1 + np.exp(-z)))
    np.testing.assert_allclose(new_state, want_state, rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(y, want_y, rtol=2e-3, atol=1e-3)


def test_pallas_interpret_odd_seqlen():
    """L=63 -> chunk=63 (not divisible by the 16-step sub-chunk): the scan
    must fall back to a full-width schedule rather than dropping steps."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(7)
    u, delta, A, B, C, D, z, bias = make_inputs(
        rng, batch=1, L=63, dim=128, n=8
    )
    want = selective_scan_ref(u, delta, A, B, C, D, z, bias, True)
    with pltpu.force_tpu_interpret_mode():
        got = selective_scan_pallas(u, delta, A, B, C, D, z, bias, True)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_pallas_pads_non_lane_multiple_dim():
    """dim=96 (not a 128 multiple): the dispatcher pads the channel axis
    to a lane multiple and slices the result (VERDICT r1 item 9)."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(7)
    u, delta, A, B, C, D, z, bias = make_inputs(
        rng, batch=2, L=64, dim=96, n=8
    )
    want = selective_scan_ref(u, delta, A, B, C, D, z, bias, True)
    with pltpu.force_tpu_interpret_mode():
        got = selective_scan_pallas(u, delta, A, B, C, D, z, bias, True)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_pallas_dstate_256():
    """dstate=256 -- the reference kernel's documented maximum
    (selective_scan.cpp:262); the chunk length scales down so the
    (chunk*n_state, d_block) rows stay in VMEM."""
    from jax.experimental.pallas import tpu as pltpu

    from dimsum_tpu.ops.selective_scan import _pick_blocks

    chunk, d_block = _pick_blocks(64, 128, 256)
    assert chunk * 256 <= 4096 and 64 % chunk == 0

    rng = np.random.default_rng(8)
    u, delta, A, B, C, D, z, bias = make_inputs(
        rng, batch=1, L=64, dim=128, n=256
    )
    want = selective_scan_ref(u, delta, A, B, C, D, z, bias, True)
    with pltpu.force_tpu_interpret_mode():
        got = selective_scan_pallas(u, delta, A, B, C, D, z, bias, True)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# ngroups mode: B/C of shape (batch, L, G, N), group g driving channels
# [g*dim/G, (g+1)*dim/G) -- the reference's variable-B groups
# (selective_scan_interface.py:94, B (b, ngroups, dstate, l)).
# ---------------------------------------------------------------------------


def _grouped_oracle(fn, u, delta, A, Bg, Cg, D, z, bias):
    """Per-group slicing through the (tested) ngroups=1 path."""
    G = Bg.shape[2]
    dim = u.shape[-1]
    gw = dim // G
    outs = []
    for g in range(G):
        sl = slice(g * gw, (g + 1) * gw)
        outs.append(fn(
            u[..., sl], delta[..., sl], A[sl], Bg[:, :, g], Cg[:, :, g],
            D[sl] if D is not None else None,
            z[..., sl] if z is not None else None,
            bias[sl] if bias is not None else None, True))
    return jnp.concatenate(outs, axis=-1)


def _make_grouped(rng, batch=2, L=64, dim=256, n=8, G=2):
    u, delta, A, B, C, D, z, bias = make_inputs(rng, batch, L, dim, n)
    Bg = rng.standard_normal((batch, L, G, n)).astype(np.float32)
    Cg = rng.standard_normal((batch, L, G, n)).astype(np.float32)
    return u, delta, A, Bg, Cg, D, z, bias


@pytest.mark.parametrize("G", [2, 4])
def test_grouped_xla_matches_per_group_slices(G):
    rng = np.random.default_rng(10)
    u, delta, A, Bg, Cg, D, z, bias = _make_grouped(rng, dim=64, G=G)
    want = _grouped_oracle(selective_scan_xla, u, delta, A, Bg, Cg, D, z,
                           bias)
    got = selective_scan_xla(u, delta, A, Bg, Cg, D, z, bias, True)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    got_ref = selective_scan_ref(u, delta, A, Bg, Cg, D, z, bias, True)
    np.testing.assert_allclose(got_ref, want, rtol=2e-4, atol=2e-4)


def test_grouped_pallas_interpret_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(11)
    u, delta, A, Bg, Cg, D, z, bias = _make_grouped(rng, dim=256, G=2)
    want = selective_scan_xla(u, delta, A, Bg, Cg, D, z, bias, True)
    with pltpu.force_tpu_interpret_mode():
        got = selective_scan_pallas(u, delta, A, Bg, Cg, D, z, bias, True)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)


def test_grouped_xla_grads_match_per_group_slices():
    rng = np.random.default_rng(12)
    u, delta, A, Bg, Cg, D, z, bias = _make_grouped(rng, dim=64, G=2)

    def loss_g(u, Bg, Cg):
        out = selective_scan_xla(u, delta, A, Bg, Cg, D, z, bias, True)
        return jnp.sum(out * jnp.cos(out))

    def loss_o(u, Bg, Cg):
        out = _grouped_oracle(selective_scan_xla, u, delta, A, Bg, Cg, D,
                              z, bias)
        return jnp.sum(out * jnp.cos(out))

    got = jax.grad(loss_g, argnums=(0, 1, 2))(u, Bg, Cg)
    want = jax.grad(loss_o, argnums=(0, 1, 2))(u, Bg, Cg)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_grouped_pallas_custom_vjp_grads_interpret():
    """Grads through the grouped Pallas op (custom_vjp with XLA-recompute
    backward) == grads of the XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(13)
    u, delta, A, Bg, Cg, D, z, bias = _make_grouped(rng, dim=256, G=2)

    def loss(fn, u, Bg):
        out = fn(u, delta, A, Bg, Cg, D, z, bias, True)
        return jnp.sum(out * jnp.sin(out))

    want = jax.grad(lambda u_, B_: loss(selective_scan_xla, u_, B_),
                    argnums=(0, 1))(u, Bg)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(lambda u_, B_: loss(selective_scan_pallas, u_, B_),
                       argnums=(0, 1))(u, Bg)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)
