"""Full-block attention kernel (ops/full_attention.py): fwd + grad parity
vs jax.nn.dot_product_attention in interpret mode on CPU.  On-chip parity
and throughput live in benchmarks/attn_micro.py (BENCH.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dimsum_tpu.ops.full_attention import (full_block_attention,
                                           full_block_supported)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("DIMSUM_ATTN_INTERPRET", "1")


@pytest.mark.parametrize("B,L,H,Dh", [(2, 128, 4, 64), (1, 256, 2, 32)])
def test_full_block_attention_fwd_parity(B, L, H, Dh):
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(B, L, H, Dh).astype(np.float32))
               for _ in range(3))
    want = jax.nn.dot_product_attention(q, k, v)
    got = full_block_attention(q, k, v, Dh ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=2e-6)


def test_full_block_attention_grad_parity():
    B, L, H, Dh = 2, 128, 2, 64
    rng = np.random.RandomState(1)
    q, k, v = (jnp.asarray(rng.randn(B, L, H, Dh).astype(np.float32))
               for _ in range(3))

    def loss(fn):
        def f(q, k, v):
            o = fn(q, k, v)
            return (o * jnp.cos(o)).sum()
        return f

    want = jax.grad(loss(jax.nn.dot_product_attention),
                    argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss(lambda q, k, v: full_block_attention(
        q, k, v, Dh ** -0.5)), argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-5, rtol=2e-5)


def test_full_block_attention_softmax_stability():
    # large logits: rowmax subtraction must keep exp finite
    B, L, H, Dh = 1, 128, 1, 64
    rng = np.random.RandomState(2)
    q = jnp.asarray(40.0 * rng.randn(B, L, H, Dh).astype(np.float32))
    k = jnp.asarray(40.0 * rng.randn(B, L, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, Dh).astype(np.float32))
    got = np.asarray(full_block_attention(q, k, v, Dh ** -0.5))
    assert np.isfinite(got).all()
    want = np.asarray(jax.nn.dot_product_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=2e-6)


def test_full_block_supported_gate():
    assert full_block_supported(1024, 64)
    assert not full_block_supported(2048, 64)   # VMEM gate
    assert not full_block_supported(1000, 64)   # not lane (128) aligned
    assert not full_block_supported(1001, 64)   # not even 8-aligned


@pytest.mark.parametrize("qb", [32, 64, 128])
def test_full_block_attention_qb_invariance(qb, monkeypatch):
    """Row-blocked grid (DIMSUM_FULL_ATTN_QB) must be output-identical to
    the one-block kernel: K is whole per step, so softmax rows never
    split."""
    from dimsum_tpu.ops import full_attention as fa

    B, L, H, Dh = 1, 128, 2, 64
    rng = np.random.RandomState(2)
    q, k, v = (jnp.asarray(rng.randn(B, L, H, Dh).astype(np.float32))
               for _ in range(3))
    base = np.asarray(fa.full_block_attention(q, k, v, Dh ** -0.5))
    monkeypatch.setenv("DIMSUM_FULL_ATTN_QB", str(qb))
    blocked = np.asarray(fa.full_block_attention(q, k, v, Dh ** -0.5))
    np.testing.assert_array_equal(blocked, base)
