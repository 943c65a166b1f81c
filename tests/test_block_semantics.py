"""Behavioral invariants of the block reorderings (reverse / transpose /
scanning continuity / windowed scan) -- these silently shift FID if wrong,
so each is pinned by an algebraic identity rather than shapes alone."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dimsum_tpu.models.blocks import MixerBlockCore, WaveDiMBlock
from dimsum_tpu.ops.norms import modulate
from dimsum_tpu.ops.scan_orders import local_reverse, local_scan


def _mk(reverse=False, transpose=False, scanning_continuity=False,
        **extra):
    return MixerBlockCore(
        dim=16, mixer_kwargs=dict(scan_impl="xla"), rms_norm=True,
        no_ffn=True, reverse=reverse, transpose=transpose,
        scanning_continuity=scanning_continuity, **extra)


def _run(block, params, x, c):
    y, _ = block.apply(params, x, None, c)
    return np.asarray(y)


def test_reverse_equals_manual_flip():
    """reverse=True block == flip -> reverse=False block -> flip, with
    identical weights (the reordering is outside the mixer)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    blk_f = _mk(reverse=False)
    blk_r = _mk(reverse=True)
    params = blk_f.init(jax.random.PRNGKey(2), x, None, c)
    # adaLN is zero-initialized => output would equal input; give it signal
    params = jax.tree.map(
        lambda a: a + 0.02 * np.random.default_rng(0).standard_normal(
            a.shape).astype(np.float32), params)

    y_r = _run(blk_r, params, x, c)
    y_manual = _run(blk_f, params, x[:, ::-1], c)[:, ::-1]
    np.testing.assert_allclose(y_r, y_manual, rtol=2e-4, atol=2e-4)


def test_transpose_equals_manual_grid_transpose():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16))  # 4x4 grid
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    blk_p = _mk(transpose=False)
    blk_t = _mk(transpose=True)
    params = blk_p.init(jax.random.PRNGKey(2), x, None, c)
    params = jax.tree.map(
        lambda a: a + 0.02 * np.random.default_rng(0).standard_normal(
            a.shape).astype(np.float32), params)

    def grid_T(v):
        B, L, C = v.shape
        s = int(round(L ** 0.5))
        return np.asarray(v).reshape(B, s, s, C).transpose(
            0, 2, 1, 3).reshape(B, L, C)

    y_t = _run(blk_t, params, x, c)
    y_manual = grid_T(_run(blk_p, params, jnp.asarray(grid_T(x)), c))
    np.testing.assert_allclose(y_t, y_manual, rtol=2e-4, atol=2e-4)


def test_scanning_continuity_is_involution_outside_mixer():
    """continuity reorder + inverse must be identity when the mixer is a
    no-op (zero gate): output == input exactly."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16))
    c = jnp.zeros((2, 16))
    blk = _mk(scanning_continuity=True)
    params = blk.init(jax.random.PRNGKey(2), x, None, c)
    # adaLN zero-init + zero c => gate 0 => block is identity on hidden path
    y, res = blk.apply(params, x, None, c)
    normed_in = np.asarray(res)  # residual = x
    np.testing.assert_allclose(normed_in, np.asarray(x), rtol=1e-6)
    # y should equal norm(x) exactly (reorder round-trip cancels)
    from dimsum_tpu.ops.norms import rms_norm

    w = params["params"]["norm"]["weight"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(
        rms_norm(x, w, eps=1e-5)), rtol=1e-5, atol=1e-6)


def test_wave_block_zero_gate_identity():
    """WaveDiMBlock with zero adaLN gate: DWT -> (no mixer effect) -> iDWT
    must reconstruct the normed input exactly (round-trip property through
    the full pack/scan/unpack pipeline)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 16))
    c = jnp.zeros((2, 16))
    blk = WaveDiMBlock(dim=16, mixer_kwargs=dict(scan_impl="xla"),
                       rms_norm=True, no_ffn=True, transpose=True)
    params = blk.init(jax.random.PRNGKey(1), x, None, c)
    y, _ = blk.apply(params, x, None, c)
    from dimsum_tpu.ops.norms import rms_norm

    w = params["params"]["norm"]["weight"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(
        rms_norm(x, w, eps=1e-5)), rtol=1e-4, atol=1e-5)


def test_wave_block_channel_last_pack_flag(monkeypatch):
    """DIMSUM_DWT_CL=1 (channel-last wavelet pack, wavelet.py dwt_tokens_cl)
    is BITWISE-equal to the default channel-major path at the block level,
    for windowed and transpose wirings and for window == patch (256-res
    grid) and window > patch (512-res grid)."""
    for L, window_scan, transpose in ((256, True, False), (256, True, True),
                                      (256, False, True), (1024, True, False)):
        x = jax.random.normal(jax.random.PRNGKey(2), (2, L, 32))
        c = jax.random.normal(jax.random.PRNGKey(3), (2, 32))
        blk = WaveDiMBlock(dim=32, mixer_kwargs=dict(scan_impl="xla"),
                           rms_norm=True, no_ffn=False,
                           window_scan=window_scan, transpose=transpose)
        params = blk.init(jax.random.PRNGKey(4), x, None, c)
        monkeypatch.delenv("DIMSUM_DWT_CL", raising=False)
        y0, _ = blk.apply(params, x, None, c)
        monkeypatch.setenv("DIMSUM_DWT_CL", "1")
        y1, _ = blk.apply(params, x, None, c)
        np.testing.assert_array_equal(
            np.asarray(y0), np.asarray(y1),
            err_msg=f"L={L} window_scan={window_scan} transpose={transpose}")
        monkeypatch.delenv("DIMSUM_DWT_CL", raising=False)


def test_window_scan_partitions_windows():
    """After local_scan(w), each contiguous w*w slice is one spatial window."""
    H = W = 8
    w = 4
    grid = np.arange(H * W).reshape(1, H * W, 1).astype(np.float32)
    scanned = np.asarray(local_scan(jnp.asarray(grid), w=w, H=H, W=W))
    first_window = scanned[0, : w * w, 0]
    want = np.asarray([r * W + c for r in range(w) for c in range(w)])
    np.testing.assert_array_equal(first_window, want)
    back = np.asarray(local_reverse(jnp.asarray(scanned), w=w, H=H, W=W))
    np.testing.assert_array_equal(back, grid)
