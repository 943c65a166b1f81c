"""Full DiM model parity vs an independent torch composition: patch embed +
pos embed, t/y embedders (c = t_emb + y_emb), two combined blocks with the
alternating reverse schedule, a shared DiT attention block after every 2nd
layer, final adaLN layer, unpatchify (reference DiM.forward,
models_dim.py:1796-1884)."""

import math

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dimsum_tpu.models.dim import DiM, DiMConfig
from dimsum_tpu.models.embedders import get_2d_sincos_pos_embed
from dimsum_tpu.utils.ckpt import convert_torch_state_dict
from tests.test_block_torch_parity import (
    D, GRID, L, make_block_sd, t_adaln, t_modulate, torch_combined_block, _r,
)

PATCH = 2
IMG = GRID * PATCH  # latent resolution 16
CIN = 4
NCLS = 10


def make_model_sd(rng):
    sd = {
        "pos_embed": _r(rng, 1, L, D),
        "x_embedder.proj.weight": _r(rng, D, CIN, PATCH, PATCH),
        "x_embedder.proj.bias": _r(rng, D),
        "t_embedder.mlp.0.weight": _r(rng, D, 256),
        "t_embedder.mlp.0.bias": _r(rng, D),
        "t_embedder.mlp.2.weight": _r(rng, D, D),
        "t_embedder.mlp.2.bias": _r(rng, D),
        "y_embedder.embedding_table.weight": _r(rng, NCLS + 1, D),
        "final_layer.adaLN_modulation.1.weight": _r(rng, 2 * D, D),
        "final_layer.adaLN_modulation.1.bias": _r(rng, 2 * D),
        "final_layer.linear.weight": _r(rng, PATCH * PATCH * CIN, D),
        "final_layer.linear.bias": _r(rng, PATCH * PATCH * CIN),
        "attn_block.attn.qkv.weight": _r(rng, 3 * D, D),
        "attn_block.attn.qkv.bias": _r(rng, 3 * D),
        "attn_block.attn.proj.weight": _r(rng, D, D),
        "attn_block.attn.proj.bias": _r(rng, D),
        "attn_block.adaLN_modulation.1.weight": _r(rng, 6 * D, D),
        "attn_block.adaLN_modulation.1.bias": _r(rng, 6 * D),
        "attn_block.mlp.w12.weight": _r(rng, 8 * D, D),
        "attn_block.mlp.w12.bias": _r(rng, 8 * D),
        "attn_block.mlp.w3.weight": _r(rng, D, 4 * D),
        "attn_block.mlp.w3.bias": _r(rng, D),
    }
    for i in range(2):
        for k, v in make_block_sd(rng).items():
            sd[f"blocks.{i}.{k}"] = v
    return sd


def torch_dit_attn_block(sd, x, c, heads=16):
    sh_a, sc_a, g_a, sh_m, sc_m, g_m = t_adaln(
        sd, "attn_block.adaLN_modulation.1", c, 6)
    n1 = F.layer_norm(x, (D,), eps=1e-6)
    B, N, _ = x.shape
    hd = D // heads
    w = torch.tensor(sd["attn_block.attn.qkv.weight"], dtype=torch.float64)
    b = torch.tensor(sd["attn_block.attn.qkv.bias"], dtype=torch.float64)
    qkv = (t_modulate(n1, sh_a, sc_a) @ w.T + b).reshape(B, N, 3, heads, hd)
    qkv = qkv.permute(2, 0, 3, 1, 4)
    attn = torch.softmax(qkv[0] @ qkv[1].transpose(-2, -1) / math.sqrt(hd),
                         dim=-1)
    o = (attn @ qkv[2]).transpose(1, 2).reshape(B, N, D)
    w = torch.tensor(sd["attn_block.attn.proj.weight"], dtype=torch.float64)
    b = torch.tensor(sd["attn_block.attn.proj.bias"], dtype=torch.float64)
    x = x + g_a.unsqueeze(1) * (o @ w.T + b)
    n2 = F.layer_norm(x, (D,), eps=1e-6)
    w12 = torch.tensor(sd["attn_block.mlp.w12.weight"], dtype=torch.float64)
    b12 = torch.tensor(sd["attn_block.mlp.w12.bias"], dtype=torch.float64)
    w3 = torch.tensor(sd["attn_block.mlp.w3.weight"], dtype=torch.float64)
    b3 = torch.tensor(sd["attn_block.mlp.w3.bias"], dtype=torch.float64)
    hid = t_modulate(n2, sh_m, sc_m) @ w12.T + b12
    a, gt = hid.chunk(2, dim=-1)
    return x + g_m.unsqueeze(1) * ((F.gelu(a, approximate="tanh") * gt)
                                   @ w3.T + b3)


def torch_dim_forward(sd, x_np, t_np, y_np):
    x = torch.tensor(x_np, dtype=torch.float64)
    B = x.shape[0]
    # timestep embedding: cat [cos, sin]
    half = 128
    freqs = torch.exp(-math.log(10000) * torch.arange(half,
                                                      dtype=torch.float64)
                      / half)
    args = torch.tensor(t_np, dtype=torch.float64)[:, None] * freqs[None]
    t_freq = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    w0 = torch.tensor(sd["t_embedder.mlp.0.weight"], dtype=torch.float64)
    b0 = torch.tensor(sd["t_embedder.mlp.0.bias"], dtype=torch.float64)
    w2 = torch.tensor(sd["t_embedder.mlp.2.weight"], dtype=torch.float64)
    b2 = torch.tensor(sd["t_embedder.mlp.2.bias"], dtype=torch.float64)
    t_emb = F.silu(t_freq @ w0.T + b0) @ w2.T + b2
    table = torch.tensor(sd["y_embedder.embedding_table.weight"],
                         dtype=torch.float64)
    c = t_emb + table[torch.tensor(y_np, dtype=torch.long)]

    # patch embed (conv k=p s=p) + pos embed
    wp = torch.tensor(sd["x_embedder.proj.weight"], dtype=torch.float64)
    bp = torch.tensor(sd["x_embedder.proj.bias"], dtype=torch.float64)
    tok = F.conv2d(x, wp, bp, stride=PATCH).flatten(2).transpose(1, 2)
    tok = tok + torch.tensor(sd["pos_embed"], dtype=torch.float64)

    residual = None
    h = tok
    for i in range(2):
        bsd = {k[len(f"blocks.{i}."):]: v for k, v in sd.items()
               if k.startswith(f"blocks.{i}.")}
        # fused add+norm threads (h, residual); combined-block oracle takes
        # the POST-ADD input, so feed h + residual and keep the sum
        inp = h if residual is None else h + residual
        out, _ = torch_combined_block(bsd, inp.numpy(), c.numpy(),
                                      reverse=(i % 2 > 0),
                                      transpose=(i % 4 >= 2))
        h = torch.tensor(out, dtype=torch.float64)
        residual = inp
        if (i + 1) % 2 == 0:
            h = torch_dit_attn_block(sd, h, c)

    # final layer
    sh, sc = t_adaln(sd, "final_layer.adaLN_modulation.1", c, 2)
    n = F.layer_norm(h, (D,), eps=1e-6)
    wl = torch.tensor(sd["final_layer.linear.weight"], dtype=torch.float64)
    bl = torch.tensor(sd["final_layer.linear.bias"], dtype=torch.float64)
    out = t_modulate(n, sh, sc) @ wl.T + bl
    # unpatchify nhwpqc->nchpwq
    out = out.reshape(B, GRID, GRID, PATCH, PATCH, CIN)
    out = torch.einsum("nhwpqc->nchpwq", out)
    return out.reshape(B, CIN, IMG, IMG).numpy()


def test_full_dim_matches_torch_oracle():
    rng = np.random.default_rng(5)
    sd = make_model_sd(rng)
    x = rng.standard_normal((2, CIN, IMG, IMG)).astype(np.float32)
    t = np.array([0.3, 0.8], np.float32)
    y = np.array([2, 7], np.int64)
    want = torch_dim_forward(sd, x, t, y)

    cfg = DiMConfig(img_resolution=IMG, patch_size=PATCH, hidden_size=D,
                    depth=2, num_classes=NCLS, label_dropout=0.1,
                    rms_norm=True, block_type="combined", cond_mamba=True,
                    learnable_pe=True, use_attn_every_k_layers=2,
                    scan_impl="xla")
    model = DiM(cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(t), jnp.asarray(y))["params"]
    params = convert_torch_state_dict(sd, template, strict=True)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 jnp.asarray(t), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)
