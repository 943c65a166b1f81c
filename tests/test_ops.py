"""Parity tests for conv / norms / wavelet / dct / scan orders against
independent torch (CPU) and numpy oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from dimsum_tpu.ops.causal_conv1d import causal_conv1d, causal_conv1d_update
from dimsum_tpu.ops.norms import fused_add_norm, layer_norm, rms_norm
from dimsum_tpu.ops.wavelet import dwt2d, idwt2d, dwt_tokens, idwt_tokens
from dimsum_tpu.ops.dct import (
    dct_1d, idct_1d, dct_2d, idct_2d, dct_patch, idct_patch,
)
from dimsum_tpu.ops.scan_orders import (
    SCAN_ZOO, reverse_permut_np, local_scan, local_reverse,
)


# ------------------------------- conv -------------------------------------


@pytest.mark.parametrize("W", [2, 3, 4])
@pytest.mark.parametrize("L", [8, 63, 256])
def test_causal_conv1d_matches_torch(W, L):
    rng = np.random.default_rng(0)
    B, D = 2, 16
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    w = rng.standard_normal((D, W)).astype(np.float32)
    b = rng.standard_normal(D).astype(np.float32)

    # torch oracle: depthwise conv1d with left pad W-1, like the reference
    xt = torch.tensor(x).permute(0, 2, 1)  # (B, D, L)
    conv = F.conv1d(xt, torch.tensor(w)[:, None, :], torch.tensor(b),
                    padding=W - 1, groups=D)[..., :L]
    want = F.silu(conv).permute(0, 2, 1).numpy()

    got = causal_conv1d(x, w, b, activation="silu")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_causal_conv1d_update_matches_full():
    """Streaming updates must reproduce the full conv outputs."""
    rng = np.random.default_rng(1)
    B, D, W, L = 2, 8, 4, 12
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    w = rng.standard_normal((D, W)).astype(np.float32)
    b = rng.standard_normal(D).astype(np.float32)
    full = np.asarray(causal_conv1d(x, w, b))
    state = jnp.zeros((B, W, D))
    for t in range(L):
        y, state = causal_conv1d_update(jnp.asarray(x[:, t]), state, w, b)
        np.testing.assert_allclose(y, full[:, t], rtol=1e-5, atol=1e-5)


# ------------------------------- norms -------------------------------------


def test_rms_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 32)).astype(np.float32)
    w = rng.standard_normal(32).astype(np.float32)
    xt = torch.tensor(x)
    rstd = torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-5)
    want = (xt * rstd * torch.tensor(w)).numpy()
    got = rms_norm(x, w, eps=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 32)).astype(np.float32)
    w = rng.standard_normal(32).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    want = F.layer_norm(torch.tensor(x), (32,), torch.tensor(w),
                        torch.tensor(b), eps=1e-6).numpy()
    got = layer_norm(x, w, b, eps=1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_add_norm_residual_semantics():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    r = rng.standard_normal((2, 5, 16)).astype(np.float32)
    w = np.ones(16, np.float32)
    out, new_r = fused_add_norm(x, w, residual=r, is_rms=True, eps=1e-5)
    np.testing.assert_allclose(new_r, x + r, rtol=1e-6)
    np.testing.assert_allclose(out, rms_norm(x + r, w, eps=1e-5), rtol=1e-6)
    assert new_r.dtype == jnp.float32


# ------------------------------- wavelet -----------------------------------


def _haar_filters():
    h = 1 / np.sqrt(2)
    dec_lo, dec_hi = np.array([h, h]), np.array([-h, h])
    lo_r, hi_r = dec_lo[::-1], dec_hi[::-1]
    w_ll = lo_r[None, :] * lo_r[:, None]
    w_lh = lo_r[None, :] * hi_r[:, None]
    w_hl = hi_r[None, :] * lo_r[:, None]
    w_hh = hi_r[None, :] * hi_r[:, None]
    return [w_ll, w_lh, w_hl, w_hh]


def test_dwt2d_matches_torch_conv():
    """Against the reference's grouped stride-2 conv formulation
    (wavelet_layer.py DWT_Function)."""
    rng = np.random.default_rng(5)
    B, C, H, W = 2, 3, 8, 8
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    xt = torch.tensor(x)
    outs = []
    for filt in _haar_filters():
        wt = torch.tensor(filt, dtype=torch.float32)[None, None]
        outs.append(F.conv2d(xt, wt.expand(C, -1, -1, -1), stride=2,
                             groups=C))
    want = torch.cat(outs, dim=1).numpy()
    got = dwt2d(x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_idwt_is_inverse():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    np.testing.assert_allclose(idwt2d(dwt2d(x)), x, rtol=1e-5, atol=1e-5)


def test_dwt_tokens_roundtrip():
    rng = np.random.default_rng(7)
    for lv in (1, 2):
        x = rng.standard_normal((2, 256, 8)).astype(np.float32)
        packed = dwt_tokens(x, num_lv=lv)
        assert packed.shape == x.shape
        np.testing.assert_allclose(idwt_tokens(packed, num_lv=lv), x,
                                   rtol=1e-4, atol=1e-5)


def test_wavelet_pack_windowed_matches_composition():
    """Fused pack == local_scan(dwt_tokens(x)) and fused unpack ==
    idwt_tokens(local_reverse(x)) for both window orientations and for
    grids where the window equals / differs from the block size (256-res
    grid 16 -> window 4 == p; 512-res grid 32 -> window 8 != p)."""
    from dimsum_tpu.ops.scan_orders import local_reverse, local_scan
    from dimsum_tpu.ops.wavelet import (
        wavelet_pack_windowed, wavelet_unpack_windowed,
    )

    rng = np.random.default_rng(8)
    for side in (16, 32):
        L = side * side
        x = rng.standard_normal((2, L, 32)).astype(np.float32)
        for cf in (False, True):
            window = side // 4
            want = local_scan(dwt_tokens(x, 2), w=window, H=side, W=side,
                              column_first=cf)
            got = wavelet_pack_windowed(x, 2, column_first=cf)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"pack side={side} cf={cf}")
            back_want = idwt_tokens(
                local_reverse(got, w=window, H=side, W=side,
                              column_first=cf), 2)
            back = wavelet_unpack_windowed(got, 2, column_first=cf)
            np.testing.assert_allclose(np.asarray(back),
                                       np.asarray(back_want),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"unpack side={side} cf={cf}")
            np.testing.assert_allclose(np.asarray(back), x,
                                       rtol=1e-4, atol=1e-5)


def test_dwt_tokens_cl_matches_composition():
    """Channel-last pack/unpack (dwt_tokens_cl / idwt_tokens_cl) is
    BITWISE-equal to the channel-major compositions it replaces, in every
    mode WaveDiMBlock can reach: plain (== dwt_tokens), grid-transpose
    (== transpose_tokens(dwt_tokens)), windowed row/column (== local_scan
    (dwt_tokens)), at num_lv 2 (256-res window==patch AND 512-res
    window>patch grids) and num_lv 1."""
    from einops import rearrange

    from dimsum_tpu.ops.scan_orders import local_reverse, local_scan
    from dimsum_tpu.ops.wavelet import dwt_tokens_cl, idwt_tokens_cl

    rng = np.random.default_rng(11)
    for lv, side, C in ((2, 16, 32), (2, 32, 64), (1, 16, 16), (1, 4, 8)):
        L = side * side
        win = side // 2 ** lv
        x = rng.standard_normal((2, L, C)).astype(np.float32)
        ref = dwt_tokens(x, lv)
        got = dwt_tokens_cl(x, lv)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=f"plain lv={lv} side={side}")
        np.testing.assert_array_equal(
            np.asarray(idwt_tokens_cl(got, lv)),
            np.asarray(idwt_tokens(ref, lv)),
            err_msg=f"plain-inv lv={lv} side={side}")
        ref_t = rearrange(ref, "b (h w) c -> b (w h) c", h=side)
        got_t = dwt_tokens_cl(x, lv, grid_transpose=True)
        np.testing.assert_array_equal(np.asarray(got_t), np.asarray(ref_t),
                                      err_msg=f"grid_t lv={lv} side={side}")
        np.testing.assert_allclose(
            np.asarray(idwt_tokens_cl(got_t, lv, grid_transpose=True)), x,
            rtol=1e-4, atol=1e-5, err_msg=f"grid_t-inv lv={lv} side={side}")
        for cf in (False, True):
            ref_w = local_scan(ref, w=win, H=side, W=side, column_first=cf)
            got_w = dwt_tokens_cl(x, lv, window_scan=True, column_first=cf)
            np.testing.assert_array_equal(
                np.asarray(got_w), np.asarray(ref_w),
                err_msg=f"win lv={lv} side={side} cf={cf}")
            back_ref = idwt_tokens(
                local_reverse(ref_w, w=win, H=side, W=side, column_first=cf),
                lv)
            back = idwt_tokens_cl(got_w, lv, window_scan=True,
                                  column_first=cf)
            np.testing.assert_array_equal(
                np.asarray(back), np.asarray(back_ref),
                err_msg=f"win-inv lv={lv} side={side} cf={cf}")


def test_dwt_tokens_energy_scaling():
    """2-level pack divides by 4 (reference :579): constant image maps the
    LL-of-LL band to mean value."""
    x = np.ones((1, 64, 2), np.float32)
    packed = np.asarray(dwt_tokens(x, num_lv=2))
    # all-ones: dwt ll = 2*mean per level => after /4 the ll^2 token is 1
    assert np.isclose(packed.max(), 1.0, atol=1e-5)


# --------------------------------- dct -------------------------------------


def test_dct_1d_matches_scipy_ortho():
    from scipy.fft import dct as sdct
    rng = np.random.default_rng(8)
    x = rng.standard_normal((3, 16)).astype(np.float32)
    want = sdct(x, type=2, norm="ortho")
    got = dct_1d(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(idct_1d(got), x, rtol=1e-4, atol=1e-5)


def test_dct_2d_patchwise_roundtrip():
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    coef = dct_2d(x, size=4)
    assert coef.shape == x.shape
    np.testing.assert_allclose(idct_2d(coef, size=4), x, rtol=1e-4,
                               atol=1e-5)


def test_dct_patch_matches_reference_conv_layout():
    """dct_patch output channel order must be (c, v, u) with c slowest,
    matching the grouped-conv layout of init_dct_kernel."""
    rng = np.random.default_rng(10)
    B, C, H, W, k = 1, 2, 8, 8, 4
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)

    # torch oracle: build the DCT basis conv exactly like the reference
    ks = np.zeros([k, k, 1, k * k])
    XX, YY = np.meshgrid(range(k), range(k))
    Cc = np.ones(k)
    Cc[0] = 1 / np.sqrt(2)
    for v in range(k):
        for u in range(k):
            kern = ((2 * Cc[v] * Cc[u] / k)
                    * np.cos((2 * YY + 1) * v * np.pi / (2 * k))
                    * np.cos((2 * XX + 1) * u * np.pi / (2 * k)))
            ks[:, :, 0, u + v * k] = kern
    wt = torch.tensor(np.transpose(ks, (3, 2, 0, 1)), dtype=torch.float32)
    wt = torch.cat([wt] * C, 0)
    want = F.conv2d(torch.tensor(x), wt, stride=k, groups=C).numpy()

    got = dct_patch(x, k, k)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # and the inverse
    back = idct_patch(np.asarray(got), k, k)
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)


# ------------------------------ scan orders --------------------------------


@pytest.mark.parametrize("zoo", ["sweep", "zigma", "jpeg"])
@pytest.mark.parametrize("N", [4, 8, 16])
def test_paths_are_permutations(zoo, N):
    for p in SCAN_ZOO[zoo](N):
        assert sorted(p.tolist()) == list(range(N * N))
        rev = reverse_permut_np(p)
        np.testing.assert_array_equal(p[rev], np.arange(N * N))
        np.testing.assert_array_equal(rev[p], np.arange(N * N))


def test_jpeg_path_golden_n4():
    """Golden vectors captured from the reference implementation."""
    paths = SCAN_ZOO["jpeg"](4)
    np.testing.assert_array_equal(
        paths[0], [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])
    np.testing.assert_array_equal(
        paths[1], [0, 4, 1, 2, 5, 8, 12, 9, 6, 3, 7, 10, 13, 14, 11, 15])
    np.testing.assert_array_equal(
        paths[2], [3, 2, 7, 11, 6, 1, 0, 5, 10, 15, 14, 9, 4, 8, 13, 12])
    np.testing.assert_array_equal(
        paths[3], [3, 7, 2, 1, 6, 11, 15, 10, 5, 0, 4, 9, 14, 13, 8, 12])


def test_sweep_zigma_golden_n4():
    np.testing.assert_array_equal(SCAN_ZOO["sweep"](4)[1],
                                  [0, 4, 8, 12, 1, 5, 9, 13,
                                   2, 6, 10, 14, 3, 7, 11, 15])
    np.testing.assert_array_equal(SCAN_ZOO["zigma"](4)[0],
                                  [0, 1, 2, 3, 7, 6, 5, 4,
                                   8, 9, 10, 11, 15, 14, 13, 12])
    np.testing.assert_array_equal(SCAN_ZOO["zigma"](4)[1],
                                  [0, 4, 8, 12, 13, 9, 5, 1,
                                   2, 6, 10, 14, 15, 11, 7, 3])


@pytest.mark.parametrize("column_first", [False, True])
def test_local_scan_roundtrip_and_order(column_first):
    B, H, W, C, w = 2, 8, 8, 3, 4
    rng = np.random.default_rng(11)
    x = rng.standard_normal((B, H * W, C)).astype(np.float32)
    scanned = local_scan(x, w=w, H=H, W=W, column_first=column_first)
    back = local_reverse(np.asarray(scanned), w=w, H=H, W=W,
                         column_first=column_first)
    np.testing.assert_allclose(back, x, rtol=0, atol=0)
    # first window of a row-major scan = top-left wxw block
    if not column_first:
        grid = x.reshape(B, H, W, C)
        want_first = grid[:, :w, :w].reshape(B, w * w, C)
        np.testing.assert_allclose(
            np.asarray(scanned)[:, : w * w], want_first)


@pytest.mark.parametrize("is_rms,has_bias", [(True, False), (False, True),
                                             (False, False)])
def test_fused_add_norm_pallas_matches_xla(is_rms, has_bias, monkeypatch):
    """Pallas add+norm kernel (interpret mode) vs the XLA reference path:
    fwd outputs and grads for x/residual/weight/bias."""
    import jax

    rng = np.random.RandomState(0)
    B, L, D = 2, 8, 256
    x = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    res = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    w = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(D).astype(np.float32)) if has_bias else None

    def f(x, res, w, b):
        out, new_res = fused_add_norm(x, w, b, residual=res, eps=1e-5,
                                      is_rms=is_rms)
        return (out * jnp.cos(out)).sum() + (new_res * 0.3).sum()

    args = (x, res, w, b) if has_bias else (x, res, w)
    fx = (lambda x, res, w, b=None: f(x, res, w, b if has_bias else None))
    want = jax.grad(fx, argnums=tuple(range(len(args))))(*args)
    want_out = fused_add_norm(x, w, b, residual=res, eps=1e-5, is_rms=is_rms)

    monkeypatch.setenv("DIMSUM_NORM_INTERPRET", "1")
    got_out = fused_add_norm(x, w, b, residual=res, eps=1e-5, is_rms=is_rms)
    got = jax.grad(fx, argnums=tuple(range(len(args))))(*args)

    for a, e in zip(got_out, want_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=2e-5)
    for a, e in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=2e-4,
                                   rtol=2e-4)


@pytest.mark.parametrize("side", [16, 32])
@pytest.mark.parametrize("column_first", [False, True])
def test_dwt_tokens_windowed_single_rearrange(column_first, side):
    """dwt_tokens_windowed == local_scan(dwt_tokens(.)) BITWISE (side ==
    patch^2 composes the two 6-D transposes into one), and the inverse
    round-trips."""
    from dimsum_tpu.ops.wavelet import (
        dwt_tokens, idwt_tokens, dwt_tokens_windowed, idwt_tokens_windowed)
    from dimsum_tpu.ops.scan_orders import local_scan, local_reverse

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, side * side, 48))
                    .astype(np.float32))
    w = side // 4
    want = local_scan(dwt_tokens(x, 2), w=w, H=side, W=side,
                      column_first=column_first)
    got = dwt_tokens_windowed(x, 2, column_first=column_first)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    back = idwt_tokens(
        local_reverse(want, w=w, H=side, W=side,
                      column_first=column_first), 2)
    got2 = idwt_tokens_windowed(got, 2, column_first=column_first)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(back))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(x),
                               rtol=1e-5, atol=1e-5)
