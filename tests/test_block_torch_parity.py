"""Full DiMBlockCombined parity against an independent torch implementation
of the reference block (models_dim.py:974-1117): fused add+RMSNorm ->
channel split -> spatial mixer branch (reverse/transpose reorder + adaLN)
and Haar frequency branch (2-level pack + window scan + adaLN) ->
bidirectional cross-attention -> residual -> adaLN GatedMLP FFN.

Every piece below is written from the reference equations in torch --
agreement with the flax block through the converter pins the entire wiring.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dimsum_tpu.models.blocks import DiMBlockCombined
from dimsum_tpu.utils.ckpt import convert_torch_state_dict
from tests.test_mixer_torch_parity import torch_mamba_forward

D = 32          # block width; halves are 16
HALF = D // 2
GRID = 8        # 8x8 = 64 tokens
L = GRID * GRID
HEADS = 8


def _r(rng, *s):
    return (0.1 * rng.standard_normal(s)).astype(np.float32)


def make_block_sd(rng):
    d_inner, d_state, d_conv = 2 * HALF, 16, 4
    dt_rank = math.ceil(HALF / 16)
    sd = {"norm.weight": 1 + 0.1 * _r(rng, D), "norm_2.weight": 1 + 0.1 * _r(rng, D)}
    for br in ("spatial_mamba", "freq_mamba"):
        sd.update({
            f"{br}.mixer.in_proj.weight": _r(rng, 2 * d_inner, HALF),
            f"{br}.mixer.conv1d.weight": _r(rng, d_inner, 1, d_conv),
            f"{br}.mixer.conv1d.bias": _r(rng, d_inner),
            f"{br}.mixer.x_proj.weight": _r(rng, dt_rank + 2 * d_state,
                                            d_inner),
            f"{br}.mixer.dt_proj.weight": _r(rng, d_inner, dt_rank),
            f"{br}.mixer.dt_proj.bias": _r(rng, d_inner),
            f"{br}.mixer.cond_proj.weight": _r(rng, d_inner, D),
            f"{br}.mixer.cond_proj.bias": _r(rng, d_inner),
            f"{br}.mixer.A_log": np.abs(_r(rng, d_inner, d_state)),
            f"{br}.mixer.D": np.ones(d_inner, np.float32),
            f"{br}.mixer.out_proj.weight": _r(rng, HALF, d_inner),
            f"{br}.adaLN_modulation.1.weight": _r(rng, 3 * HALF, D),
            f"{br}.adaLN_modulation.1.bias": _r(rng, 3 * HALF),
        })
    sd.update({
        "proj.qkv1.weight": _r(rng, 3 * HALF, HALF),
        "proj.qkv1.bias": _r(rng, 3 * HALF),
        "proj.qkv2.weight": _r(rng, 3 * HALF, HALF),
        "proj.qkv2.bias": _r(rng, 3 * HALF),
        "proj.proj.weight": _r(rng, D, D),
        "proj.proj.bias": _r(rng, D),
        "adaLN_modulation.1.weight": _r(rng, 3 * D, D),
        "adaLN_modulation.1.bias": _r(rng, 3 * D),
        "mlp.w12.weight": _r(rng, 8 * D, D),
        "mlp.w12.bias": _r(rng, 8 * D),
        "mlp.w3.weight": _r(rng, D, 4 * D),
        "mlp.w3.bias": _r(rng, D),
    })
    return sd


# ------------------------- torch reference pieces ---------------------------


def t_rms(x, w, eps=1e-5):
    return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps) * w


def t_modulate(x, shift, scale):
    return x * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)


def t_adaln(sd, prefix, c, n):
    w = torch.tensor(sd[f"{prefix}.weight"], dtype=torch.float64)
    b = torch.tensor(sd[f"{prefix}.bias"], dtype=torch.float64)
    return (F.silu(c) @ w.T + b).chunk(n, dim=1)


def t_dwt(x):
    """(B, C, H, W) -> (B, 4C, H/2, W/2) Haar, subband-major."""
    a = x[:, :, 0::2, 0::2]
    b = x[:, :, 0::2, 1::2]
    c = x[:, :, 1::2, 0::2]
    d = x[:, :, 1::2, 1::2]
    return torch.cat([(a + b + c + d), (a + b - c - d),
                      (a - b + c - d), (a - b - c + d)], dim=1) * 0.5


def t_idwt(x):
    B, C4, H, W = x.shape
    ll, lh, hl, hh = torch.chunk(x, 4, dim=1)
    a = 0.5 * (ll + lh + hl + hh)
    b = 0.5 * (ll + lh - hl - hh)
    c = 0.5 * (ll - lh + hl - hh)
    d = 0.5 * (ll - lh - hl + hh)
    out = torch.zeros(B, C4 // 4, 2 * H, 2 * W, dtype=x.dtype)
    out[:, :, 0::2, 0::2] = a
    out[:, :, 0::2, 1::2] = b
    out[:, :, 1::2, 0::2] = c
    out[:, :, 1::2, 1::2] = d
    return out


def t_dwt_pack(x_tokens, num_lv=2):
    """reference _dwt_fast (models_dim.py:572-586)."""
    B, L_, C = x_tokens.shape
    side = int(round(L_ ** 0.5))
    x = x_tokens.permute(0, 2, 1).reshape(B, C, side, side)
    sub = t_dwt(x)
    patch = 2 ** num_lv
    out = t_dwt(sub) / (2 ** num_lv)
    chunks = torch.chunk(out, patch * patch, dim=1)
    idx = [i % 4 * patch + i // 4 for i in range(patch * patch)]
    out = torch.cat([chunks[i] for i in idx], dim=1)
    # einops "b (c p1 p2) h w -> b (h p1 w p2) c" with c slowest
    h = out.shape[2]
    out = out.reshape(B, C, patch, patch, h, h)
    out = out.permute(0, 4, 2, 5, 3, 1).reshape(B, L_, C)
    return out


def t_dwt_unpack(x_tokens, num_lv=2):
    B, L_, C = x_tokens.shape
    patch = 2 ** num_lv
    lowest = int(round(L_ ** 0.5)) // patch
    x = x_tokens * (2 ** num_lv)
    x = x.reshape(B, lowest, patch, lowest, patch, C)
    x = x.permute(0, 5, 2, 4, 1, 3).reshape(B, C * patch * patch, lowest,
                                            lowest)
    chunks = torch.chunk(x, patch * patch, dim=1)
    idx = [i % 4 * patch + i // 4 for i in range(patch * patch)]
    x = torch.cat([chunks[i] for i in idx], dim=1)
    out = t_idwt(t_idwt(x))
    return out.reshape(B, C, L_).permute(0, 2, 1)


def t_local_scan(x, w, H, W, column_first=False):
    B, L_, C = x.shape
    xg = x.reshape(B, H // w, w, W // w, w, C)
    if column_first:
        xg = xg.permute(0, 3, 1, 4, 2, 5)
    else:
        xg = xg.permute(0, 1, 3, 2, 4, 5)
    return xg.reshape(B, L_, C)


def t_local_reverse(x, w, H, W, column_first=False):
    B, L_, C = x.shape
    if column_first:
        xg = x.reshape(B, W // w, H // w, w, w, C).permute(0, 2, 4, 1, 3, 5)
    else:
        xg = x.reshape(B, H // w, W // w, w, w, C).permute(0, 1, 3, 2, 4, 5)
    return xg.reshape(B, L_, C)


def t_cross_attn(sd, x1, x2):
    B, N, C = x1.shape
    head_dim = C // HEADS

    def qkv(x, name):
        w = torch.tensor(sd[f"proj.{name}.weight"], dtype=torch.float64)
        b = torch.tensor(sd[f"proj.{name}.bias"], dtype=torch.float64)
        out = (x @ w.T + b).reshape(B, N, 3, HEADS, head_dim)
        out = out.permute(2, 0, 3, 1, 4)
        return out[0], out[1], out[2]

    q1, k1, v1 = qkv(x1, "qkv1")
    q2, k2, v2 = qkv(x2, "qkv2")

    def sdpa(q, k, v):
        attn = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(head_dim),
                             dim=-1)
        return attn @ v

    x12 = sdpa(q1, k2, v2).transpose(1, 2).reshape(B, N, C)
    x21 = sdpa(q2, k1, v1).transpose(1, 2).reshape(B, N, C)
    w = torch.tensor(sd["proj.proj.weight"], dtype=torch.float64)
    b = torch.tensor(sd["proj.proj.bias"], dtype=torch.float64)
    return torch.cat([x12, x21], dim=-1) @ w.T + b


def torch_combined_block(sd, x_np, c_np, reverse, transpose):
    x = torch.tensor(x_np, dtype=torch.float64)
    c = torch.tensor(c_np, dtype=torch.float64)
    residual = x
    h = t_rms(x, torch.tensor(sd["norm.weight"], dtype=torch.float64))
    x1, x2 = h[..., :HALF], h[..., HALF:]

    def branch_sd(br):
        return {k[len(br) + 7:]: v for k, v in sd.items()
                if k.startswith(f"{br}.mixer.")}

    # spatial branch = DiMBlockRaw(norm=Identity): reorder + adaLN + mixer
    hs = x1
    if transpose:
        hs = hs.reshape(-1, GRID, GRID, HALF).permute(0, 2, 1, 3).reshape(
            -1, L, HALF)
    if reverse:
        hs = hs.flip(1)
    sh, sc, g = t_adaln(sd, "spatial_mamba.adaLN_modulation.1", c, 3)
    mix = torch.tensor(torch_mamba_forward(
        branch_sd("spatial_mamba"), t_modulate(hs, sh, sc).numpy()),
        dtype=torch.float64)
    hs = hs + g.unsqueeze(1) * mix
    if reverse:
        hs = hs.flip(1)
    if transpose:
        hs = hs.reshape(-1, GRID, GRID, HALF).permute(0, 2, 1, 3).reshape(
            -1, L, HALF)
    x1_out = hs

    # frequency branch = WaveDiMBlock(no_ffn, window_scan,
    # transpose=parent.reverse, reverse=False)
    hf = t_dwt_pack(x2)
    patch = 4
    hf = t_local_scan(hf, w=GRID // patch, H=GRID, W=GRID,
                      column_first=reverse)
    sh, sc, g = t_adaln(sd, "freq_mamba.adaLN_modulation.1", c, 3)
    mix = torch.tensor(torch_mamba_forward(
        branch_sd("freq_mamba"), t_modulate(hf, sh, sc).numpy()),
        dtype=torch.float64)
    hf = hf + g.unsqueeze(1) * mix
    hf = t_local_reverse(hf, w=GRID // patch, H=GRID, W=GRID,
                         column_first=reverse)
    x2_out = t_dwt_unpack(hf)

    fused = t_cross_attn(sd, x1_out, x2_out)
    h = h + fused
    sh, sc, g = t_adaln(sd, "adaLN_modulation.1", c, 3)
    n2 = t_rms(h, torch.tensor(sd["norm_2.weight"], dtype=torch.float64))
    w12 = torch.tensor(sd["mlp.w12.weight"], dtype=torch.float64)
    b12 = torch.tensor(sd["mlp.w12.bias"], dtype=torch.float64)
    w3 = torch.tensor(sd["mlp.w3.weight"], dtype=torch.float64)
    b3 = torch.tensor(sd["mlp.w3.bias"], dtype=torch.float64)
    hid = t_modulate(n2, sh, sc) @ w12.T + b12
    a, bgate = hid.chunk(2, dim=-1)
    mlp = (F.gelu(a, approximate="tanh") * bgate) @ w3.T + b3
    h = h + g.unsqueeze(1) * mlp
    return h.numpy(), residual.numpy()


def _run_case(reverse, transpose):
    rng = np.random.default_rng(0)
    sd = make_block_sd(rng)
    x = rng.standard_normal((2, L, D)).astype(np.float32)
    c = rng.standard_normal((2, D)).astype(np.float32)
    want, want_res = torch_combined_block(sd, x, c, reverse, transpose)

    blk = DiMBlockCombined(dim=D, mixer_kwargs=dict(
        scan_impl="xla", d_cond=D), rms_norm=True, reverse=reverse,
        transpose=transpose)
    template = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), None,
                        jnp.asarray(c))["params"]
    params = convert_torch_state_dict(sd, template, strict=True)
    got, got_res = blk.apply({"params": params}, jnp.asarray(x), None,
                             jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_res), want_res, rtol=1e-5,
                               atol=1e-5)


def test_combined_block_matches_torch_oracle_plain():
    _run_case(reverse=False, transpose=False)


def test_combined_block_matches_torch_oracle_reverse():
    _run_case(reverse=True, transpose=False)


def test_combined_block_matches_torch_oracle_transpose():
    _run_case(reverse=False, transpose=True)


# ----------------------- combined_fourier (DCT) variant ---------------------


def t_zigzag_mamba(sd, x, perm, perm_rev):
    """Mixer with zigzag gathers (reference mamba_simple.py:627-657):
    permute tokens after in_proj (equivalently before: in_proj is
    per-token), inverse-permute after out_proj."""
    xp = x[:, perm, :]
    out = torch_mamba_forward(sd, xp)
    return out[:, perm_rev, :]


def t_dct_patch(x, k):
    """(B, C, H, W) -> (B, C*k*k, H/k, W/k), channel order (c, v, u)."""
    n = k
    kk = np.arange(n)[:, None]
    xx = np.arange(n)[None, :]
    M = np.sqrt(2.0 / n) * np.cos((2 * xx + 1) * kk * np.pi / (2 * n))
    M[0] /= np.sqrt(2.0)
    M = torch.tensor(M, dtype=torch.float64)
    B, C, H, W = x.shape
    blk = x.reshape(B, C, H // k, k, W // k, k)
    out = torch.einsum("bchywx,vy,ux->bcvuhw", blk, M, M)
    return out.reshape(B, C * k * k, H // k, W // k)


def t_idct_patch(x, k):
    n = k
    kk = np.arange(n)[:, None]
    xx = np.arange(n)[None, :]
    M = np.sqrt(2.0 / n) * np.cos((2 * xx + 1) * kk * np.pi / (2 * n))
    M[0] /= np.sqrt(2.0)
    M = torch.tensor(M, dtype=torch.float64)
    B, CR, H, W = x.shape
    C = CR // (k * k)
    coef = x.reshape(B, C, k, k, H, W)
    blk = torch.einsum("bcvuhw,vy,ux->bchywx", coef, M, M)
    return blk.reshape(B, C, H * k, W * k)


def test_combined_fourier_block_matches_torch_oracle():
    from dimsum_tpu.ops.scan_orders import jpeg_zigzag, reverse_permut_np

    rng = np.random.default_rng(3)
    sd = make_block_sd(rng)
    x = rng.standard_normal((2, L, D)).astype(np.float32)
    c = rng.standard_normal((2, D)).astype(np.float32)

    # oracle: same skeleton, DCT branch with jpeg_2 zigzag mixer
    xt = torch.tensor(x, dtype=torch.float64)
    ct = torch.tensor(c, dtype=torch.float64)
    h = t_rms(xt, torch.tensor(sd["norm.weight"], dtype=torch.float64))
    x1, x2 = h[..., :HALF], h[..., HALF:]

    def branch_sd(br):
        return {k[len(br) + 7:]: v for k, v in sd.items()
                if k.startswith(f"{br}.mixer.")}

    sh, sc, g = t_adaln(sd, "spatial_mamba.adaLN_modulation.1", ct, 3)
    mix = torch.tensor(torch_mamba_forward(
        branch_sd("spatial_mamba"), t_modulate(x1, sh, sc).numpy()),
        dtype=torch.float64)
    x1_out = x1 + g.unsqueeze(1) * mix

    # DCT branch (dct_size=4, reverse/transpose False inside combined)
    k4 = 4
    hf = x2.permute(0, 2, 1).reshape(-1, HALF, GRID, GRID)
    hf = t_dct_patch(hf, k4)
    # "b (c p1 p2) h w -> b (h p1 w p2) c"
    hh = GRID // k4
    hf = hf.reshape(-1, HALF, k4, k4, hh, hh).permute(
        0, 4, 2, 5, 3, 1).reshape(-1, L, HALF)
    sh, sc, g = t_adaln(sd, "freq_mamba.adaLN_modulation.1", ct, 3)
    perms = jpeg_zigzag(GRID)[:2]
    # layer_idx 0 uses path 0 of the depth-tiled jpeg_2 list
    perm = perms[0]
    perm_rev = reverse_permut_np(perm)
    mix = torch.tensor(t_zigzag_mamba(
        branch_sd("freq_mamba"),
        t_modulate(hf, sh, sc).numpy(), perm, perm_rev),
        dtype=torch.float64)
    hf = hf + g.unsqueeze(1) * mix
    hf = hf.reshape(-1, hh, k4, hh, k4, HALF).permute(
        0, 5, 2, 4, 1, 3).reshape(-1, HALF * k4 * k4, hh, hh)
    x2_out = t_idct_patch(hf, k4).reshape(-1, HALF, L).permute(0, 2, 1)

    fused = t_cross_attn(sd, x1_out, x2_out)
    h2 = h + fused
    sh, sc, g = t_adaln(sd, "adaLN_modulation.1", ct, 3)
    n2 = t_rms(h2, torch.tensor(sd["norm_2.weight"], dtype=torch.float64))
    w12 = torch.tensor(sd["mlp.w12.weight"], dtype=torch.float64)
    b12 = torch.tensor(sd["mlp.w12.bias"], dtype=torch.float64)
    w3 = torch.tensor(sd["mlp.w3.weight"], dtype=torch.float64)
    b3 = torch.tensor(sd["mlp.w3.bias"], dtype=torch.float64)
    hid = t_modulate(n2, sh, sc) @ w12.T + b12
    a, bgate = hid.chunk(2, dim=-1)
    mlp = (F.gelu(a, approximate="tanh") * bgate) @ w3.T + b3
    want = (h2 + g.unsqueeze(1) * mlp).numpy()

    from dimsum_tpu.ops.scan_orders import build_layer_paths

    fwd, bwd = build_layer_paths(GRID, "jpeg_2", 1)
    blk = DiMBlockCombined(
        dim=D, mixer_kwargs=dict(scan_impl="xla", d_cond=D),
        mixer_kwargs_2=dict(scan_impl="xla", d_cond=D, layer_idx=0,
                            scan_type="jpeg_2", zigzag_paths=np.asarray(fwd),
                            zigzag_paths_reverse=np.asarray(bwd)),
        rms_norm=True, freq_variant="dct")
    template = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), None,
                        jnp.asarray(c))["params"]
    params = convert_torch_state_dict(sd, template, strict=True)
    got, _ = blk.apply({"params": params}, jnp.asarray(x), None,
                       jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
