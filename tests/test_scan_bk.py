"""Brent-Kung combine schedules vs the Sklansky doubling rows (the r3
default; see BENCH.md "Brent-Kung scan schedule")."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dimsum_tpu.ops.selective_scan import (
    scan_rows,
    scan_rows_bk,
    scan_rows_rev,
    scan_rows_rev_bk,
)


def make(chunk, n=16, d=128, seed=0):
    rng = np.random.default_rng(seed)
    rows = chunk * n
    a = jnp.asarray(np.exp(-np.abs(rng.standard_normal((rows, d))))
                    .astype(np.float32))
    x = jnp.asarray(rng.standard_normal((rows, d)).astype(np.float32))
    h0 = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    return a, x, h0


@pytest.mark.parametrize("chunk", [8, 24, 64, 256])
def test_bk_matches_sklansky(chunk):
    n, d = 16, 128
    a, x, h0 = make(chunk, n, d)
    h1, l1 = scan_rows(a, x, h0, n, chunk, d, sub=8)
    h2, l2 = scan_rows_bk(a, x, h0, n, chunk, d)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("chunk", [8, 64, 256])
@pytest.mark.parametrize("shift_g", [True, False])
def test_bk_rev_matches_sklansky(chunk, shift_g):
    n, d = 16, 128
    a, p, _ = make(chunk, n, d, seed=1)
    w = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((n, d)).astype(np.float32))
    e1, w1 = scan_rows_rev(a, p, w, n, chunk, d, sub=8, shift_g=shift_g)
    e2, w2 = scan_rows_rev_bk(a, p, w, n, chunk, d, shift_g=shift_g)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                               rtol=1e-5, atol=1e-5)


def test_bk_against_sequential_oracle():
    """BK against a hand-rolled sequential recurrence (independent of the
    Sklansky implementation)."""
    n, chunk, d = 8, 16, 128
    a, x, h0 = make(chunk, n, d, seed=3)
    h2, last = scan_rows_bk(a, x, h0, n, chunk, d)
    an = np.asarray(a).reshape(chunk, n, d)
    xn = np.asarray(x).reshape(chunk, n, d)
    h = np.asarray(h0, np.float64)
    outs = []
    for t in range(chunk):
        h = an[t] * h + xn[t]
        outs.append(h.copy())
    want = np.concatenate(outs, 0)
    np.testing.assert_allclose(np.asarray(h2).reshape(chunk * n, d), want,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(last), outs[-1],
                               rtol=1e-5, atol=1e-5)


def test_pick_blocks_odd_seqlen_keeps_full_chunk():
    """Seqlens in 129..255 with no power-of-two divisor under the 128 cap
    must fall back to ONE full-width chunk (the odd-chunk scan path), not
    collapse to a degenerate grid of 1-timestep invocations."""
    from dimsum_tpu.ops.selective_scan import _pick_blocks

    chunk, d_block = _pick_blocks(175, 256, 16)
    assert chunk == 175
    chunk, _ = _pick_blocks(250, 256, 16)   # 250 = 2 * 125: halves to 2,
    assert chunk == 250                     # then full-width fallback
    chunk, _ = _pick_blocks(256, 256, 16)   # power-of-two: capped at 128
    assert chunk == 128
    chunk, _ = _pick_blocks(64, 256, 16)
    assert chunk == 64
    # huge odd seqlen * n_state beyond the 4096-row budget: keep halving
    chunk, _ = _pick_blocks(6250, 256, 16)
    assert chunk >= 1 and 6250 % chunk == 0
