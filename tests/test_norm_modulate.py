"""Fused (gate-add +) add + norm + adaLN-modulate kernel vs the exact-order
XLA composition (ops/norms.py norm_modulate)."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dimsum_tpu.ops import norms


def make(B=2, L=32, D=256, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, L, D)).astype(dtype)
    branch = rng.standard_normal((B, L, D)).astype(dtype)
    res = rng.standard_normal((B, L, D)).astype(np.float32)
    gate = (0.5 * rng.standard_normal((B, D))).astype(dtype)
    shift = (0.3 * rng.standard_normal((B, D))).astype(dtype)
    scale = (0.3 * rng.standard_normal((B, D))).astype(dtype)
    w = (1 + 0.1 * rng.standard_normal(D)).astype(np.float32)
    b = (0.1 * rng.standard_normal(D)).astype(np.float32)
    return x, branch, res, gate, shift, scale, w, b


CASES = [
    # (has_branch, has_gate, has_res, has_mod, is_rms, has_w)
    (True, True, False, True, True, True),    # mixer-gate site (norm_2)
    (True, False, False, True, True, True),   # combined-block fused add
    (False, False, True, False, True, True),  # plain add+norm
    (True, True, False, True, False, False),  # DiT second LN (no affine)
    (False, False, False, True, False, False),  # DiT first LN / FinalLayer
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_kernel_matches_composition_interpret(case, dtype, monkeypatch):
    monkeypatch.setenv("DIMSUM_NORM_INTERPRET", "1")
    has_branch, has_gate, has_res, has_mod, is_rms, has_w = case
    x, branch, res, gate, shift, scale, w, b = make(dtype=np.float32)
    kw = dict(
        branch=jnp.asarray(branch, dtype) if has_branch else None,
        gate=jnp.asarray(gate, dtype) if has_gate else None,
        residual=jnp.asarray(res) if has_res else None,
        shift=jnp.asarray(shift, dtype) if has_mod else None,
        scale=jnp.asarray(scale, dtype) if has_mod else None,
        eps=1e-5 if is_rms else 1e-6,
        is_rms=is_rms,
        total_dtype=jnp.float32 if has_res else None,
    )
    wa = jnp.asarray(w) if has_w else None
    ba = jnp.asarray(b) if (has_w and not is_rms) else None
    xa = jnp.asarray(x, dtype)
    out_k, tot_k = norms.norm_modulate(xa, wa, ba, **kw)

    monkeypatch.setenv("DIMSUM_NORM_INTERPRET", "0")
    monkeypatch.setenv("DIMSUM_FUSED_NORM", "0")
    out_r, tot_r = norms.norm_modulate(xa, wa, ba, **kw)
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_r, np.float32),
        rtol=tol, atol=tol)
    np.testing.assert_allclose(
        np.asarray(tot_k, np.float32), np.asarray(tot_r, np.float32),
        rtol=tol, atol=tol)


def test_kernel_grads_match_composition_interpret(monkeypatch):
    x, branch, res, gate, shift, scale, w, b = make()

    def loss(fused, xa, br, g, sh, sc, wa):
        monkeypatch.setenv("DIMSUM_NORM_INTERPRET", "1" if fused else "0")
        monkeypatch.setenv("DIMSUM_FUSED_NORM", "1" if fused else "0")
        out, tot = norms.norm_modulate(
            xa, wa, None, branch=br, gate=g, shift=sh, scale=sc,
            eps=1e-5, is_rms=True)
        return jnp.sum(out ** 2) + jnp.sum(tot ** 2)

    args = tuple(map(jnp.asarray, (x, branch, gate, shift, scale, w)))
    g_k = jax.grad(functools.partial(loss, True), argnums=range(6))(*args)
    g_r = jax.grad(functools.partial(loss, False), argnums=range(6))(*args)
    for a, c in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fallback_matches_legacy_composition_bitwise(dtype):
    """Off-TPU the helper must reproduce the legacy unfused op order
    exactly -- including the PER-OP bf16 rounding of the gate-add (the
    legacy blocks computed `hidden + gate*branch` in the stream dtype)."""
    x, branch, res, gate, shift, scale, w, b = make()
    xa, ba, ga, sh, sc = (jnp.asarray(v, dtype)
                          for v in (x, branch, gate, shift, scale))
    out, tot = norms.norm_modulate(
        xa, jnp.asarray(w), None, branch=ba, gate=ga, shift=sh, scale=sc,
        eps=1e-5, is_rms=True)
    legacy_tot = xa + ga[:, None, :] * ba
    legacy_out = norms.modulate(
        norms.rms_norm(legacy_tot, jnp.asarray(w), eps=1e-5), sh, sc)
    np.testing.assert_array_equal(
        np.asarray(tot, np.float32), np.asarray(legacy_tot, np.float32))
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(legacy_out, np.float32))


def test_mxu_reduction_norms_match(monkeypatch):
    """DIMSUM_NORM_MXU=1 (ones-column matvec reductions) matches the
    reduce-based norms; off-TPU the flag is inert, so force the math path
    by calling the helper directly."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((4, 8, 256)).astype(np.float32))
    w = jnp.asarray((1 + 0.1 * rng.standard_normal(256)).astype(np.float32))
    b = jnp.asarray((0.1 * rng.standard_normal(256)).astype(np.float32))
    monkeypatch.setattr(norms, "_norm_mxu_reductions", lambda: True)
    got_r = norms.rms_norm(x, w, eps=1e-5)
    got_l = norms.layer_norm(x, w, b, eps=1e-6)
    monkeypatch.setattr(norms, "_norm_mxu_reductions", lambda: False)
    np.testing.assert_allclose(np.asarray(got_r),
                               np.asarray(norms.rms_norm(x, w, eps=1e-5)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_l),
        np.asarray(norms.layer_norm(x, w, b, eps=1e-6)),
        rtol=1e-5, atol=1e-5)
