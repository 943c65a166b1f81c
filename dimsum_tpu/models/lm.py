"""Mamba language-model stack: MixerModel / MambaLMHeadModel + generation.

Reference: `/root/reference/mamba/mamba_ssm/models/mixer_seq_simple.py`
(MixerModel/MambaLMHeadModel) and `mamba_ssm/utils/generation.py` (decode
loop with CUDA-graph capture :316).  TPU-native equivalents:

  * training/scoring forward: embedding -> N x (add+norm -> Mamba mixer)
    -> final norm -> tied lm_head, full-sequence selective scan.
  * generation: the reference captures CUDA graphs to amortize launch
    overhead; on TPU the entire decode loop is ONE compiled program -- a
    `lax.scan` over steps carrying per-layer (conv_state, ssm_state), using
    the single-token recurrences (`mamba_step`, the analogue of the Triton
    `selective_state_update` + `causal_conv1d_update` pair).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from dimsum_tpu.models.mamba import Mamba
from dimsum_tpu.ops.causal_conv1d import causal_conv1d_update
from dimsum_tpu.ops.norms import fused_add_norm
from dimsum_tpu.ops.selective_scan import selective_state_update


def mamba_step(params, x, conv_state, ssm_state, dt_rank: int,
               d_state: int = 16):
    """Single-token Mamba mixer step on a converted/trained param tree
    (reference mamba_simple.py:299-344).

    params: the flax param dict of one `Mamba` module (scan_type 'none').
    x: (B, d_model); conv_state: (B, W, d_inner); ssm_state: (B, d_inner, N).
    Returns (out (B, d_model), conv_state, ssm_state).
    """
    f32 = jnp.float32
    xz = x @ params["in_proj"]["kernel"]
    d_inner = xz.shape[-1] // 2
    xi, z = xz[:, :d_inner], xz[:, d_inner:]
    xc, conv_state = causal_conv1d_update(
        xi, conv_state, params["conv1d_kernel"],
        params.get("conv1d_bias"), activation="silu")
    dbl = xc @ params["x_proj"]["kernel"]
    dt_low = dbl[:, :dt_rank]
    Bm = dbl[:, dt_rank: dt_rank + d_state]
    Cm = dbl[:, dt_rank + d_state:]
    dt = dt_low @ params["dt_proj_kernel"]
    A = -jnp.exp(params["A_log"].astype(f32))
    y, ssm_state = selective_state_update(
        ssm_state, xc, dt, A, Bm, Cm, D=params["D"], z=z,
        dt_bias=params["dt_proj_bias"], dt_softplus=True)
    out = y @ params["out_proj"]["kernel"]
    return out, conv_state, ssm_state


class LMBlock(nn.Module):
    """Add -> Norm -> Mixer prenorm block (reference mamba_simple.py:383-435)."""

    d_model: int
    rms_norm: bool = True
    norm_eps: float = 1e-5
    residual_in_fp32: bool = True
    layer_idx: int = 0
    scan_impl: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, residual=None):
        weight = self.param("norm_weight", nn.initializers.ones,
                            (self.d_model,))
        bias = None if self.rms_norm else self.param(
            "norm_bias", nn.initializers.zeros, (self.d_model,))
        hidden_states, residual = fused_add_norm(
            hidden_states, weight, bias, residual=residual,
            eps=self.norm_eps, residual_in_fp32=self.residual_in_fp32,
            is_rms=self.rms_norm)
        hidden_states = Mamba(d_model=self.d_model, layer_idx=self.layer_idx,
                              scan_impl=self.scan_impl, dtype=self.dtype,
                              name="mixer")(hidden_states)
        return hidden_states, residual


@dataclasses.dataclass(frozen=True)
class MambaLMConfig:
    d_model: int = 768
    n_layer: int = 24
    vocab_size: int = 50277
    rms_norm: bool = True
    residual_in_fp32: bool = True
    pad_vocab_size_multiple: int = 8
    tie_embeddings: bool = True
    dtype: Any = jnp.float32
    scan_impl: Optional[str] = None

    @property
    def padded_vocab(self) -> int:
        m = self.pad_vocab_size_multiple
        return ((self.vocab_size + m - 1) // m) * m


class MambaLMHeadModel(nn.Module):
    cfg: MambaLMConfig

    @nn.compact
    def __call__(self, input_ids):
        """input_ids: (B, L) int32 -> logits (B, L, padded_vocab)."""
        cfg = self.cfg
        embedding = nn.Embed(cfg.padded_vocab, cfg.d_model,
                             embedding_init=nn.initializers.normal(0.02),
                             name="embedding")
        x = embedding(input_ids).astype(cfg.dtype)
        residual = None
        for i in range(cfg.n_layer):
            x, residual = LMBlock(
                d_model=cfg.d_model, rms_norm=cfg.rms_norm,
                residual_in_fp32=cfg.residual_in_fp32, layer_idx=i,
                scan_impl=cfg.scan_impl, dtype=cfg.dtype,
                name=f"layers_{i}")(x, residual)
        w = self.param("norm_f_weight", nn.initializers.ones, (cfg.d_model,))
        x = fused_add_norm(x, w, None, residual=residual, prenorm=False,
                           is_rms=cfg.rms_norm)
        if cfg.tie_embeddings:
            logits = x @ embedding.embedding.T.astype(cfg.dtype)
        else:
            logits = nn.Dense(cfg.padded_vocab, use_bias=False,
                              dtype=cfg.dtype, name="lm_head")(x)
        return logits.astype(jnp.float32)


def generate(params, cfg: MambaLMConfig, input_ids, max_new_tokens: int,
             rng=None, temperature: float = 1.0, top_k: int = 0,
             d_conv: int = 4, d_state: int = 16):
    """Autoregressive generation as one jitted program: prefill scan over the
    prompt, then a decode scan carrying all layer states.

    input_ids: (B, L_prompt) int32.  Returns (B, L_prompt+max_new_tokens).
    """
    p = params["params"]
    B = input_ids.shape[0]
    d_inner = 2 * cfg.d_model
    dt_rank = math.ceil(cfg.d_model / 16)
    embed = p["embedding"]["embedding"]

    def init_states():
        return [
            (jnp.zeros((B, d_conv, d_inner)),
             jnp.zeros((B, d_inner, d_state)))
            for _ in range(cfg.n_layer)
        ]

    def forward_token(states, token):
        """One full-model step; returns (new_states, logits (B, V))."""
        x = embed[token]  # (B, d_model)
        residual = None
        new_states = []
        for i in range(cfg.n_layer):
            lp = p[f"layers_{i}"]
            total = x if residual is None else x + residual
            normed = _norm(total, lp["norm_weight"], cfg.rms_norm)
            out, cs, ss = mamba_step(lp["mixer"], normed, *states[i],
                                     dt_rank=dt_rank, d_state=d_state)
            new_states.append((cs, ss))
            x, residual = out, total
        total = x + residual
        final = _norm(total, p["norm_f_weight"], cfg.rms_norm)
        logits = final @ embed.T
        return new_states, logits

    def _norm(x, w, rms):
        xf = x.astype(jnp.float32)
        if rms:
            r = jax.lax.rsqrt(jnp.mean(xf ** 2, -1, keepdims=True) + 1e-5)
            return (xf * r * w).astype(x.dtype)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * w).astype(x.dtype)

    def prefill_step(states, token):
        states, logits = forward_token(states, token)
        return states, logits

    states, logits = jax.lax.scan(
        prefill_step, init_states(), jnp.swapaxes(input_ids, 0, 1))
    last_logits = logits[-1]

    if rng is None:
        rng = jax.random.PRNGKey(0)

    def sample_token(key, logits):
        if temperature == 0.0:
            return jnp.argmax(logits, -1).astype(jnp.int32)
        logits = logits / temperature
        if top_k > 0:
            kth = jnp.sort(logits, -1)[:, -top_k][:, None]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        return jax.random.categorical(key, logits).astype(jnp.int32)

    def decode_step(carry, _):
        states, logits, key = carry
        key, sub = jax.random.split(key)
        token = sample_token(sub, logits)
        states, logits = forward_token(states, token)
        return (states, logits, key), token

    key, sub = jax.random.split(rng)
    first_token = sample_token(sub, last_logits)
    states, logits = forward_token(states, first_token)
    (_, _, _), tokens = jax.lax.scan(
        decode_step, (states, logits, key), None,
        length=max_new_tokens - 1)
    all_new = jnp.concatenate([first_token[None], tokens], axis=0)
    return jnp.concatenate([input_ids, jnp.swapaxes(all_new, 0, 1)], axis=1)
