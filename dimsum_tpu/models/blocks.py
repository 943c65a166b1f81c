"""DiM block zoo: raw/linear/window/wave/dct/einfft/combined variants + MoE +
DiT attention block.

Reference: `/root/reference/dimsum/models_dim.py` --
  DiMBlock :223-358, DiMBlockWindow :361-502, WaveDiMBlock :505-710,
  EinFFT :713-775, DCTBlock :778-933, MoEBlock :936-971,
  DiMBlockCombined :974-1117 (the published arch), CombinedFourier :1120-1264,
  CombinedEinFFT :1267-1399, DiMBlockRaw :1402-1529, DiTBlock :1532-1554 --
and `/root/reference/dimsum/switch_mlp.py` (SwitchMLP).

All blocks share the reference's prenorm structure: the residual add happens
FIRST (fused add+norm), the summed residual is threaded alongside the hidden
states, and conditioning enters via adaLN shift/scale/gate around the mixer
and FFN.  Token reorderings (transpose / serpentine continuity / reverse /
windowed scan) are pure reshapes and flips that XLA folds into the
surrounding ops.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from dimsum_tpu.ops.norms import (fused_add_norm, layer_norm, modulate,
                                   norm_modulate)
from dimsum_tpu.ops.wavelet import (
    dwt_tokens, idwt_tokens, dwt_tokens_windowed, idwt_tokens_windowed,
    wavelet_pack_windowed, wavelet_unpack_windowed,
    dwt_tokens_cl, idwt_tokens_cl,
)
from dimsum_tpu.ops.dct import dct_patch, idct_patch
from dimsum_tpu.ops.scan_orders import local_scan, local_reverse
from dimsum_tpu.models.mamba import Mamba
from dimsum_tpu.models.mlp import GatedMLP, Mlp, ExpertMLP, gelu_tanh
from dimsum_tpu.models.attention import Attention, CrossAttentionFusion


class Norm(nn.Module):
    """LayerNorm (weight+bias) or RMSNorm (weight only) with fp32 math.

    With `branch`/`shift`/`scale` the call lowers to the fused
    (gate-add +) add + norm + adaLN-modulate kernel (ops/norms.py
    `norm_modulate`) and returns (modulated, total) -- one VMEM pass on TPU
    for what XLA otherwise splits into a multi-output reduce fusion plus
    follow-up elementwise passes."""

    rms: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, residual=None, prenorm=True, residual_in_fp32=True,
                 branch=None, gate=None, shift=None, scale=None, fuse=None):
        d = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (d,))
        bias = None if self.rms else self.param(
            "bias", nn.initializers.zeros, (d,))
        if branch is not None or shift is not None:
            total_dtype = (jnp.float32
                           if residual is not None and residual_in_fp32
                           else x.dtype)
            return norm_modulate(
                x, weight, bias, branch=branch, gate=gate,
                residual=residual, shift=shift, scale=scale, eps=self.eps,
                is_rms=self.rms, total_dtype=total_dtype, fuse=fuse)
        return fused_add_norm(
            x, weight, bias, residual=residual, eps=self.eps,
            prenorm=prenorm, residual_in_fp32=residual_in_fp32,
            is_rms=self.rms,
        )


def drop_path_fn(x, rate: float, rng):
    """Per-sample stochastic depth (timm semantics; reference
    models_dim.py:1933-1951): keep with prob 1-rate, scale kept samples by
    1/(1-rate).  Callers apply it only in training."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(
        rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * (mask.astype(x.dtype) / keep)


class _DropPathMixin:
    """Blocks apply stochastic depth to the INCOMING hidden_states at the
    add+norm residual merge -- `residual + drop_path(hidden_states)` -- and
    only when a residual exists (reference models_dim.py:294,313 and every
    other block class; first block / sub-blocks enter with residual=None
    and are never dropped)."""

    def _maybe_drop_path(self, hidden_states, residual, train: bool):
        rate = getattr(self, "drop_path_rate", 0.0)
        if train and rate > 0.0 and residual is not None:
            hidden_states = drop_path_fn(
                hidden_states, rate, self.make_rng("drop_path"))
        return hidden_states


def pending_tail_mode() -> int:
    """DIMSUM_PENDING_TAIL: 0 = off (default); 1 = defer each combined
    block's tail FFN add (`total2 + gate_mlp * mlp_out`) into the NEXT
    block's top add+norm (XLA composition); 2 = same, plus the Pallas fused
    norm kernel at the deferred top sites (the kernel then absorbs the tail
    add + residual add + norm in one VMEM pass with nothing stranded -- the
    stranded-neighbor mechanism that made the standalone kernel lose is the
    op being absorbed here)."""
    try:
        return int(os.environ.get("DIMSUM_PENDING_TAIL", "0"))
    except ValueError:
        return 0


def materialize_pending(x, pending):
    """Fold a deferred block tail: x + gate * branch (identity when no
    pending)."""
    if pending is None:
        return x
    branch, gate = pending
    return x + gate[:, None, :] * branch


def _add_identity_norm(x, residual, residual_in_fp32=True):
    """norm_cls=nn.Identity case (inner blocks of the combined block)."""
    if residual is None:
        residual = x
    else:
        residual = residual + x
    out = residual
    if residual_in_fp32:
        residual = residual.astype(jnp.float32)
    return out, residual


class AdaLN(nn.Module):
    """SiLU -> Linear(n_chunks * dim), zero-initialized (adaLN-Zero)."""

    dim: int
    n_chunks: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c):
        mod = nn.Dense(self.n_chunks * self.dim, dtype=self.dtype, name="fc",
                       kernel_init=nn.initializers.zeros)(jax.nn.silu(c))
        return jnp.split(mod, self.n_chunks, axis=-1)


def _square_side(L: int) -> int:
    return int(round(L ** 0.5))


def _mixer_native_reverse_ok(mixer_kwargs) -> bool:
    """True when the reversed token order should run INSIDE the Mamba mixer
    (anticausal conv + reverse-time scan kernel, zero flips) instead of as
    explicit jnp.flip relayouts around it.

    OPT-IN (DIMSUM_NATIVE_REVERSE=1): measured r3 on v5e, the suffix-scan
    kernel is 12.7% slower per call than the forward kernel (0.561 vs
    0.498 ms; 8 reversed scans/forward = +0.51 ms) while the block-level
    flips it replaces cost only ~0.19 ms -- net -0.6% on the headline
    bench.  The machinery stays (exact-parity tested; the v2 bidirectional
    path uses it where the flips are d_inner-sized and the trade flips).
    Zigzag scan types gather by a per-layer permutation before the conv,
    which does not commute with an in-mixer reverse."""
    if os.environ.get("DIMSUM_NATIVE_REVERSE", "0") != "1":
        return False
    st = mixer_kwargs.get("scan_type", "none") or "none"
    return st.split("_")[0] not in ("zigma", "sweep", "jpeg")


def _transpose_tokens(x, h, w):
    return rearrange(x, "n (h w) c -> n (w h) c", h=h, w=w)


def _scanning_continuity(x, h, w):
    """Flip odd rows (serpentine) -- reference models_dim.py:327-330.
    Note the reference groups tokens as (w h); replicated exactly."""
    xg = rearrange(x, "n (w h) c -> n c w h", h=h, w=w)
    flipped = jnp.flip(xg[:, :, 1::2], axis=-1)
    xg = xg.at[:, :, 1::2].set(flipped)
    return rearrange(xg, "n c w h -> n (w h) c", h=h, w=w)


class MixerBlockCore(nn.Module, _DropPathMixin):
    """Shared mixer-under-adaLN core with optional token reordering and FFN.

    Covers DiMBlockRaw (no_ffn=True) and DiMBlock "linear" (no_ffn=False).
    """

    dim: int
    mixer_kwargs: Dict[str, Any]
    rms_norm: bool = False
    norm_eps: float = 1e-5
    identity_norm: bool = False
    residual_in_fp32: bool = True
    reverse: bool = False
    transpose: bool = False
    scanning_continuity: bool = False
    no_ffn: bool = True
    c_dim: Optional[int] = None
    use_gated_mlp: bool = True
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, residual=None, c=None,
                 train: bool = False):
        hidden_states = self._maybe_drop_path(hidden_states, residual, train)
        if self.identity_norm:
            hidden_states, residual = _add_identity_norm(
                hidden_states, residual, self.residual_in_fp32)
        else:
            hidden_states, residual = Norm(
                rms=self.rms_norm, eps=self.norm_eps, name="norm")(
                hidden_states, residual,
                residual_in_fp32=self.residual_in_fp32)

        L = hidden_states.shape[1]
        h = w = _square_side(L)
        if self.transpose:
            hidden_states = _transpose_tokens(hidden_states, h, w)
        if self.scanning_continuity:
            hidden_states = _scanning_continuity(hidden_states, h, w)
        # reverse runs inside the mixer when possible (anticausal conv +
        # reverse-time scan kernel): the flip commutes with modulate/gate
        # (per-batch params) so only the order-sensitive conv+scan see it
        native_rev = self.reverse and _mixer_native_reverse_ok(
            self.mixer_kwargs)
        if self.reverse and not native_rev:
            hidden_states = jnp.flip(hidden_states, axis=1)

        mixer = Mamba(d_model=self.dim, dtype=self.dtype,
                      name="mixer", reverse_tokens=native_rev,
                      **self.mixer_kwargs)
        n_chunks = 3 if self.no_ffn else 6
        mods = AdaLN(self.dim, n_chunks, dtype=self.dtype,
                     name="adaLN_modulation")(c)
        shift_ssm, scale_ssm, gate_ssm = mods[:3]
        mixer_out = mixer(modulate(hidden_states, shift_ssm, scale_ssm), c)
        if self.no_ffn:
            hidden_states = (hidden_states
                             + gate_ssm[:, None, :] * mixer_out)
        else:
            shift_mlp, scale_mlp, gate_mlp = mods[3:]
            # fused: total = hidden + gate*mixer_out; modulate(Norm(total))
            moded, hidden_states = Norm(
                rms=self.rms_norm, eps=self.norm_eps, name="norm_2")(
                hidden_states, prenorm=False, branch=mixer_out,
                gate=gate_ssm, shift=shift_mlp, scale=scale_mlp)
            mlp = GatedMLP(4 * self.dim, act=gelu_tanh, dtype=self.dtype,
                           name="mlp") if self.use_gated_mlp else Mlp(
                4 * self.dim, act=gelu_tanh, dtype=self.dtype, name="mlp")
            hidden_states = hidden_states + gate_mlp[:, None, :] * mlp(moded)

        if self.reverse and not native_rev:
            hidden_states = jnp.flip(hidden_states, axis=1)
        if self.scanning_continuity:
            hidden_states = _scanning_continuity(hidden_states, h, w)
        if self.transpose:
            hidden_states = _transpose_tokens(hidden_states, h, w)
        return hidden_states, residual


def DiMBlockRaw(**kwargs) -> MixerBlockCore:
    """Mixer-only block (reference :1402-1529)."""
    return MixerBlockCore(no_ffn=True, **kwargs)


def DiMBlock(**kwargs) -> MixerBlockCore:
    """'linear' block: mixer + FFN under 6-way adaLN (reference :223-358)."""
    return MixerBlockCore(no_ffn=False, **kwargs)


class DiMBlockWindow(nn.Module, _DropPathMixin):
    """Windowed-scan block (reference :361-502): local_scan(w=4) ordering,
    optional rolled shift-window, mixer + FFN."""

    dim: int
    mixer_kwargs: Dict[str, Any]
    rms_norm: bool = False
    norm_eps: float = 1e-5
    residual_in_fp32: bool = True
    reverse: bool = False
    transpose: bool = False
    shift_window: bool = False
    use_gated_mlp: bool = True
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, residual=None, c=None,
                 train: bool = False):
        hidden_states = self._maybe_drop_path(hidden_states, residual, train)
        hidden_states, residual = Norm(
            rms=self.rms_norm, eps=self.norm_eps, name="norm")(
            hidden_states, residual, residual_in_fp32=self.residual_in_fp32)

        L = hidden_states.shape[1]
        h = w = _square_side(L)
        column_first = bool(self.transpose)
        hidden_states = local_scan(hidden_states, w=4, H=h, W=w,
                                   column_first=column_first)
        if self.shift_window:
            xg = hidden_states.reshape(-1, h, w, hidden_states.shape[-1])
            xg = jnp.roll(xg, shift=(-1, -1), axis=(1, 2))
            hidden_states = xg.reshape(-1, h * w, xg.shape[-1])
        native_rev = self.reverse and _mixer_native_reverse_ok(
            self.mixer_kwargs)
        if self.reverse and not native_rev:
            hidden_states = jnp.flip(hidden_states, axis=1)

        mixer = Mamba(d_model=self.dim, dtype=self.dtype, name="mixer",
                      reverse_tokens=native_rev, **self.mixer_kwargs)
        mods = AdaLN(self.dim, 6, dtype=self.dtype,
                     name="adaLN_modulation")(c)
        shift_ssm, scale_ssm, gate_ssm, shift_mlp, scale_mlp, gate_mlp = mods
        mixer_out = mixer(modulate(hidden_states, shift_ssm, scale_ssm), c)
        moded, hidden_states = Norm(
            rms=self.rms_norm, eps=self.norm_eps, name="norm_2")(
            hidden_states, prenorm=False, branch=mixer_out, gate=gate_ssm,
            shift=shift_mlp, scale=scale_mlp)
        mlp_cls = GatedMLP if self.use_gated_mlp else Mlp
        hidden_states = hidden_states + gate_mlp[:, None, :] * mlp_cls(
            4 * self.dim, act=gelu_tanh, dtype=self.dtype, name="mlp")(moded)

        if self.reverse and not native_rev:
            hidden_states = jnp.flip(hidden_states, axis=1)
        if self.shift_window:
            xg = hidden_states.reshape(-1, h, w, hidden_states.shape[-1])
            xg = jnp.roll(xg, shift=(1, 1), axis=(1, 2))
            hidden_states = xg.reshape(-1, h * w, xg.shape[-1])
        hidden_states = local_reverse(hidden_states, w=4, H=h, W=w,
                                      column_first=column_first)
        return hidden_states, residual


class WaveDiMBlock(nn.Module, _DropPathMixin):
    """Frequency branch: 2-level Haar pack -> windowed scan -> mixer (+FFN)
    -> inverse (reference :505-710)."""

    dim: int
    mixer_kwargs: Dict[str, Any]
    rms_norm: bool = False
    norm_eps: float = 1e-5
    identity_norm: bool = False
    residual_in_fp32: bool = True
    reverse: bool = False
    transpose: bool = False
    scanning_continuity: bool = False
    no_ffn: bool = False
    c_dim: Optional[int] = None
    window_scan: bool = True
    num_wavelet_lv: int = 2
    use_gated_mlp: bool = True
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, residual=None, c=None,
                 train: bool = False):
        hidden_states = self._maybe_drop_path(hidden_states, residual, train)
        if self.identity_norm:
            hidden_states, residual = _add_identity_norm(
                hidden_states, residual, self.residual_in_fp32)
        else:
            hidden_states, residual = Norm(
                rms=self.rms_norm, eps=self.norm_eps, name="norm")(
                hidden_states, residual,
                residual_in_fp32=self.residual_in_fp32)

        L = hidden_states.shape[1]
        h = w = _square_side(L)
        patch = 2 ** self.num_wavelet_lv
        column_first = bool(self.transpose)
        # local_scan(dwt_tokens(x)) composes into one basis einsum + one
        # lane-aligned transpose (wavelet.py).  Wins in ISOLATION (1.26 ->
        # 1.07 ms/roundtrip microbench) but measured 4% SLOWER end-to-end
        # (0.9126 -> 0.8746 img/s, r3): the dot_general fixes operand/
        # result layouts and breaks the transpose fusion XLA otherwise does
        # with neighboring elementwise ops.  Kept opt-in; negative result,
        # do not flip without re-measuring bench.py.
        fused_pack = (self.window_scan
                      and hidden_states.shape[-1] % patch ** 2 == 0
                      and h % patch == 0
                      and os.environ.get("DIMSUM_FUSED_WAVELET", "0") == "1")
        # dwt pack + local_scan compose into ONE rearrange when the window
        # aligns with the dwt block structure (side == patch^2, the 256-res
        # configs) -- bitwise-equal, one 6-D transpose instead of two
        # materialized copies (tests/test_ops.py).  The window > patch
        # generalization (512-res side 32) is implemented and tested but
        # measured 4.6% SLOWER end-to-end (0.1799 vs 0.1886 img/s at
        # 512-res, confirmed on a healthy chip: the finer 8-factor
        # rearrange lowers to worse copies than the two-step pair XLA
        # already folds), so it is opt-in.
        win = h // patch
        one_rearrange = self.window_scan and (
            win == patch
            or (win > patch and win % patch == 0
                and os.environ.get("DIMSUM_WAVELET_ONE_REARRANGE", "0")
                == "1"))
        # Channel-last pack (wavelet.py dwt_tokens_cl): lane-aligned
        # butterflies + one C-minor-contiguous transpose; no channel-major
        # subband tensor ever exists, so BOTH 512-res copy families (the
        # {1,0,3,2}->{3,2,1,0} layout fix and the 6-D token transpose)
        # disappear from the HLO.  Bitwise-equal to the composition
        # (tests/test_ops.py).  Opt-in until measured end-to-end.
        cl_pack = (os.environ.get("DIMSUM_DWT_CL", "0") == "1"
                   and not fused_pack
                   and self.num_wavelet_lv in (1, 2)
                   and hidden_states.shape[-1] % patch ** 2 == 0
                   and h % patch == 0
                   and (not self.window_scan or (h // patch) % patch == 0
                        or h // patch == patch))
        if cl_pack:
            hidden_states = dwt_tokens_cl(
                hidden_states, self.num_wavelet_lv,
                window_scan=self.window_scan,
                grid_transpose=bool(self.transpose) and not self.window_scan,
                column_first=column_first)
        elif fused_pack:
            hidden_states = wavelet_pack_windowed(
                hidden_states, self.num_wavelet_lv,
                column_first=column_first)
        elif one_rearrange:
            hidden_states = dwt_tokens_windowed(
                hidden_states, self.num_wavelet_lv,
                column_first=column_first)
        else:
            hidden_states = dwt_tokens(hidden_states, self.num_wavelet_lv)
            if self.window_scan:
                hidden_states = local_scan(hidden_states, w=w // patch,
                                           H=h, W=w,
                                           column_first=column_first)
            elif self.transpose:
                hidden_states = _transpose_tokens(hidden_states, h, w)
        if self.scanning_continuity:
            hidden_states = _scanning_continuity(hidden_states, h, w)
        native_rev = self.reverse and _mixer_native_reverse_ok(
            self.mixer_kwargs)
        if self.reverse and not native_rev:
            hidden_states = jnp.flip(hidden_states, axis=1)

        mixer = Mamba(d_model=self.dim, dtype=self.dtype, name="mixer",
                      reverse_tokens=native_rev, **self.mixer_kwargs)
        n_chunks = 3 if self.no_ffn else 6
        mods = AdaLN(self.dim, n_chunks, dtype=self.dtype,
                     name="adaLN_modulation")(c)
        shift_ssm, scale_ssm, gate_ssm = mods[:3]
        mixer_out = mixer(modulate(hidden_states, shift_ssm, scale_ssm), c)
        if self.no_ffn:
            hidden_states = (hidden_states
                             + gate_ssm[:, None, :] * mixer_out)
        else:
            shift_mlp, scale_mlp, gate_mlp = mods[3:]
            moded, hidden_states = Norm(
                rms=self.rms_norm, eps=self.norm_eps, name="norm_2")(
                hidden_states, prenorm=False, branch=mixer_out,
                gate=gate_ssm, shift=shift_mlp, scale=scale_mlp)
            mlp_cls = GatedMLP if self.use_gated_mlp else Mlp
            hidden_states = hidden_states + gate_mlp[:, None, :] * mlp_cls(
                4 * self.dim, act=gelu_tanh, dtype=self.dtype, name="mlp")(
                moded)

        if self.reverse and not native_rev:
            hidden_states = jnp.flip(hidden_states, axis=1)
        if self.scanning_continuity:
            hidden_states = _scanning_continuity(hidden_states, h, w)
        if cl_pack:
            hidden_states = idwt_tokens_cl(
                hidden_states, self.num_wavelet_lv,
                window_scan=self.window_scan,
                grid_transpose=bool(self.transpose) and not self.window_scan,
                column_first=column_first)
        elif fused_pack:
            hidden_states = wavelet_unpack_windowed(
                hidden_states, self.num_wavelet_lv,
                column_first=column_first)
        elif one_rearrange:
            hidden_states = idwt_tokens_windowed(
                hidden_states, self.num_wavelet_lv,
                column_first=column_first)
        else:
            if self.window_scan:
                hidden_states = local_reverse(hidden_states, w=w // patch,
                                              H=h, W=w,
                                              column_first=column_first)
            elif self.transpose:
                hidden_states = _transpose_tokens(hidden_states, h, w)
            hidden_states = idwt_tokens(hidden_states, self.num_wavelet_lv)
        return hidden_states, residual


class DCTBlock(nn.Module, _DropPathMixin):
    """DCT frequency branch (reference :778-933): patchwise frozen-basis DCT,
    token regroup, mixer (+FFN), inverse DCT."""

    dim: int
    mixer_kwargs: Dict[str, Any]
    rms_norm: bool = False
    norm_eps: float = 1e-5
    identity_norm: bool = False
    residual_in_fp32: bool = True
    dct_size: int = 2
    reverse: bool = False
    transpose: bool = False
    scanning_continuity: bool = False
    no_ffn: bool = False
    c_dim: Optional[int] = None
    use_gated_mlp: bool = True
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, residual=None, c=None,
                 train: bool = False):
        hidden_states = self._maybe_drop_path(hidden_states, residual, train)
        if self.identity_norm:
            hidden_states, residual = _add_identity_norm(
                hidden_states, residual, self.residual_in_fp32)
        else:
            hidden_states, residual = Norm(
                rms=self.rms_norm, eps=self.norm_eps, name="norm")(
                hidden_states, residual,
                residual_in_fp32=self.residual_in_fp32)

        side = _square_side(hidden_states.shape[1])
        C = hidden_states.shape[-1]
        k = self.dct_size
        rk = k  # reserve_kernel == dct_size in the reference (:827)
        xg = rearrange(hidden_states, "b (h w) d -> b d h w", h=side)
        xg = dct_patch(xg, k, rk)
        hs = rearrange(xg, "b (c p1 p2) h w -> b (h p1 w p2) c",
                       c=C, p1=rk)

        if self.transpose:
            hs = _transpose_tokens(hs, side, side)
        if self.scanning_continuity:
            hs = _scanning_continuity(hs, side, side)
        native_rev = self.reverse and _mixer_native_reverse_ok(
            self.mixer_kwargs)
        if self.reverse and not native_rev:
            hs = jnp.flip(hs, axis=1)

        mixer = Mamba(d_model=self.dim, dtype=self.dtype, name="mixer",
                      reverse_tokens=native_rev, **self.mixer_kwargs)
        n_chunks = 3 if self.no_ffn else 6
        mods = AdaLN(self.dim, n_chunks, dtype=self.dtype,
                     name="adaLN_modulation")(c)
        shift_ssm, scale_ssm, gate_ssm = mods[:3]
        mixer_out = mixer(modulate(hs, shift_ssm, scale_ssm), c)
        if self.no_ffn:
            hs = hs + gate_ssm[:, None, :] * mixer_out
        else:
            shift_mlp, scale_mlp, gate_mlp = mods[3:]
            moded, hs = Norm(
                rms=self.rms_norm, eps=self.norm_eps, name="norm_2")(
                hs, prenorm=False, branch=mixer_out, gate=gate_ssm,
                shift=shift_mlp, scale=scale_mlp)
            mlp_cls = GatedMLP if self.use_gated_mlp else Mlp
            hs = hs + gate_mlp[:, None, :] * mlp_cls(
                4 * self.dim, act=gelu_tanh, dtype=self.dtype, name="mlp")(
                moded)

        if self.reverse and not native_rev:
            hs = jnp.flip(hs, axis=1)
        if self.scanning_continuity:
            hs = _scanning_continuity(hs, side, side)
        if self.transpose:
            hs = _transpose_tokens(hs, side, side)

        xg = rearrange(hs, "b (h p1 w p2) c -> b (c p1 p2) h w",
                       c=C, p1=rk, p2=rk, h=side // rk)
        out = idct_patch(xg, k, rk)
        out = rearrange(out, "b c h w -> b (h w) c")
        return out, residual


class EinFFT(nn.Module):
    """SiMBA-style spectral channel MLP (reference :713-775)."""

    dim: int
    num_blocks: int = 4
    sparsity_threshold: float = 0.01
    scale: float = 0.02

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        bs = self.dim // self.num_blocks
        init = nn.initializers.normal(self.scale)
        w1 = self.param("complex_weight_1", init,
                        (2, self.num_blocks, bs, bs))
        w2 = self.param("complex_weight_2", init,
                        (2, self.num_blocks, bs, bs))
        b1 = self.param("complex_bias_1", init, (2, self.num_blocks, bs))
        b2 = self.param("complex_bias_2", init, (2, self.num_blocks, bs))

        xb = x.reshape(B, N, self.num_blocks, bs).astype(jnp.complex64)
        xf = jnp.fft.fft2(xb, axes=(1, 2), norm="ortho")

        def mul(v, w):
            return jnp.einsum("...bd,bdk->...bk", v, w)

        r1 = jax.nn.relu(mul(xf.real, w1[0]) - mul(xf.imag, w1[1]) + b1[0])
        i1 = jax.nn.relu(mul(xf.real, w1[1]) + mul(xf.imag, w1[0]) + b1[1])
        r2 = mul(r1, w2[0]) - mul(i1, w2[1]) + b2[0]
        i2 = mul(r1, w2[1]) + mul(i1, w2[0]) + b2[1]

        lam = self.sparsity_threshold

        def softshrink(v):
            return jnp.sign(v) * jnp.maximum(jnp.abs(v) - lam, 0.0)

        r2, i2 = softshrink(r2), softshrink(i2)
        out = jnp.fft.ifft2(r2 + 1j * i2, axes=(1, 2), norm="ortho")
        # match the input dtype (the complex math runs in complex64 either
        # way); hardcoding fp32 here broke bf16 dtype uniformity downstream
        return out.real.astype(x.dtype).reshape(B, N, C)


class SwitchMLP(nn.Module):
    """Top-1 routed MoE FFN (reference switch_mlp.py).  All experts are local
    in the reference (no expert parallelism); the default path computes every
    expert densely and masks -- the TPU-friendly dense dispatch for small E.

    TPU extension: with `ep_axis` set (and `ep_mesh` a (data, model) Mesh),
    the experts live as stacked (E, ...) parameters sharded over the mesh's
    model axis and tokens go through Switch-Transformer capacity dispatch
    with GSPMD sharding constraints -- XLA inserts the cross-chip exchange
    (parallel/moe_ep.py::switch_ep_gspmd).  Exact parity with the dense path
    whenever capacity >= tokens routed to the busiest expert.
    """

    dim: int
    num_moe_experts: int = 8
    add_bias_linear: bool = False
    gated_linear_unit: bool = True
    routing_mode: str = "top1"
    ep_axis: Optional[str] = None
    ep_mesh: Any = None
    capacity_factor: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c=None):
        B, L, D = x.shape
        logits = nn.Dense(self.num_moe_experts, name="router")(x)

        if self.ep_axis is not None:
            from dimsum_tpu.parallel.moe_ep import switch_ep_gspmd

            E = self.num_moe_experts
            hidden = 4 * self.dim
            fc1_out = hidden * 2 if self.gated_linear_unit else hidden
            w1 = self.param("experts_fc1_kernel",
                            nn.initializers.lecun_normal(),
                            (E, D, fc1_out))
            w2 = self.param("experts_fc2_kernel",
                            nn.initializers.lecun_normal(),
                            (E, hidden, self.dim))
            b1 = b2 = None
            if self.add_bias_linear:
                b1 = self.param("experts_fc1_bias", nn.initializers.zeros,
                                (E, fc1_out))
                b2 = self.param("experts_fc2_bias", nn.initializers.zeros,
                                (E, self.dim))
            return switch_ep_gspmd(
                x, logits, w1, w2, b1, b2, mesh=self.ep_mesh,
                axis=self.ep_axis, capacity_factor=self.capacity_factor,
                gated=self.gated_linear_unit,
                routing_mode=self.routing_mode)

        if self.routing_mode == "sinkhorn":
            route = jax.nn.sigmoid(logits)
        else:
            route = jax.nn.softmax(logits, axis=-1)
        max_prob = jnp.max(route, axis=-1, keepdims=True)
        max_ind = jnp.argmax(route, axis=-1)
        onehot = jax.nn.one_hot(max_ind, self.num_moe_experts,
                                dtype=x.dtype)  # (B, L, E)
        out = jnp.zeros_like(x)
        for e in range(self.num_moe_experts):
            expert = ExpertMLP(self.dim, self.add_bias_linear,
                               self.gated_linear_unit, dtype=self.dtype,
                               name=f"local_experts_{e}")
            out = out + onehot[..., e : e + 1] * expert(x)
        return out * max_prob


class MoEBlock(nn.Module):
    """Add+norm wrapper around SwitchMLP (reference :936-971)."""

    dim: int
    rms_norm: bool = False
    norm_eps: float = 1e-5
    residual_in_fp32: bool = True
    num_moe_experts: int = 8
    add_bias_linear: bool = False
    gated_linear_unit: bool = True
    routing_mode: str = "top1"
    ep_axis: Optional[str] = None
    ep_mesh: Any = None
    capacity_factor: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, residual=None, c=None,
                 train: bool = False):
        # NOTE: the reference's MoEBlock receives no drop_path
        # (create_block, models_dim.py:2150-2157) -- train is accepted for
        # call-site uniformity only.
        hidden_states, residual = Norm(
            rms=self.rms_norm, eps=self.norm_eps, name="norm")(
            hidden_states, residual, residual_in_fp32=self.residual_in_fp32)
        hidden_states = SwitchMLP(
            self.dim, self.num_moe_experts, self.add_bias_linear,
            self.gated_linear_unit, self.routing_mode,
            ep_axis=self.ep_axis, ep_mesh=self.ep_mesh,
            capacity_factor=self.capacity_factor, dtype=self.dtype,
            name="mixer")(hidden_states)
        return hidden_states, residual


class DiTBlock(nn.Module):
    """adaLN-Zero attention block (reference :1532-1554)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_gated_mlp: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        mods = AdaLN(self.hidden_size, 6, dtype=self.dtype,
                     name="adaLN_modulation")(c)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods
        attn = Attention(self.num_heads, qkv_bias=True, dtype=self.dtype,
                         name="attn")
        # two fused norm+modulate passes; the second also absorbs the
        # gate_msa residual add (no learned affine in DiT layer norms)
        h1, _ = norm_modulate(x, None, shift=shift_msa, scale=scale_msa,
                              eps=1e-6, is_rms=False)
        attn_out = attn(h1)
        h2, x = norm_modulate(x, None, branch=attn_out, gate=gate_msa,
                              shift=shift_mlp, scale=scale_mlp,
                              eps=1e-6, is_rms=False)
        mlp_cls = GatedMLP if self.use_gated_mlp else Mlp
        mlp = mlp_cls(int(self.hidden_size * self.mlp_ratio), act=gelu_tanh,
                      dtype=self.dtype, name="mlp")
        x = x + gate_mlp[:, None, :] * mlp(h2)
        return x


class DiMBlockCombined(nn.Module, _DropPathMixin):
    """The published DiMSUM block (reference :974-1117):

    add+norm -> split channels -> spatial half through DiMBlockRaw and
    frequency half through WaveDiMBlock -> CrossAttentionFusion -> residual
    -> adaLN-gated GatedMLP FFN.
    """

    dim: int
    mixer_kwargs: Dict[str, Any]
    rms_norm: bool = False
    norm_eps: float = 1e-5
    residual_in_fp32: bool = True
    reverse: bool = False
    transpose: bool = False
    scanning_continuity: bool = False
    use_gated_mlp: bool = True
    freq_variant: str = "wave"  # "wave" | "dct" | "einfft"
    mixer_kwargs_2: Optional[Dict[str, Any]] = None
    drop_path_rate: float = 0.0
    defer_tail: bool = False  # return (base, residual, (mlp_out, gate)) and
    #                           let the next top norm absorb the tail add
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, residual=None, c=None,
                 train: bool = False, pending=None):
        if (pending is not None and train and self.drop_path_rate > 0.0
                and residual is not None):
            # stochastic depth drops the WHOLE previous block output --
            # materialize the deferred tail before masking
            hidden_states = materialize_pending(hidden_states, pending)
            pending = None
        if pending is None:
            hidden_states = self._maybe_drop_path(
                hidden_states, residual, train)
            hidden_states, residual = Norm(
                rms=self.rms_norm, eps=self.norm_eps, name="norm")(
                hidden_states, residual,
                residual_in_fp32=self.residual_in_fp32)
        else:
            br, g = pending
            hidden_states, residual = Norm(
                rms=self.rms_norm, eps=self.norm_eps, name="norm")(
                hidden_states, residual,
                residual_in_fp32=self.residual_in_fp32,
                branch=br, gate=g,
                fuse=True if pending_tail_mode() == 2 else None)

        half = self.dim // 2
        x1, x2 = jnp.split(hidden_states, 2, axis=2)

        spatial = DiMBlockRaw(
            dim=half, mixer_kwargs=self.mixer_kwargs, identity_norm=True,
            residual_in_fp32=self.residual_in_fp32, reverse=self.reverse,
            transpose=self.transpose,
            scanning_continuity=self.scanning_continuity,
            c_dim=self.dim, dtype=self.dtype, name="spatial_mamba")
        x1, _ = spatial(x1, None, c)

        if self.freq_variant == "wave":
            freq = WaveDiMBlock(
                dim=half, mixer_kwargs=self.mixer_kwargs, identity_norm=True,
                residual_in_fp32=self.residual_in_fp32, reverse=False,
                transpose=self.reverse,  # reference :1029
                scanning_continuity=self.scanning_continuity, no_ffn=True,
                c_dim=self.dim, num_wavelet_lv=2, dtype=self.dtype,
                name="freq_mamba")
            x2, _ = freq(x2, None, c)
        elif self.freq_variant == "dct":
            freq = DCTBlock(
                dim=half, mixer_kwargs=self.mixer_kwargs_2,
                identity_norm=True, residual_in_fp32=self.residual_in_fp32,
                reverse=False, transpose=False,
                scanning_continuity=self.scanning_continuity, no_ffn=True,
                c_dim=self.dim, dct_size=4, dtype=self.dtype,
                name="freq_mamba")
            x2, _ = freq(x2, None, c)
        elif self.freq_variant == "einfft":
            x2 = EinFFT(half, name="freq_mamba")(x2)
        else:
            raise ValueError(self.freq_variant)

        fused = CrossAttentionFusion(
            self.dim, num_heads=8, qkv_bias=True, swap_k=False,
            dtype=self.dtype, name="proj")(x1, x2)

        shift_mlp, scale_mlp, gate_mlp = AdaLN(
            self.dim, 3, dtype=self.dtype, name="adaLN_modulation")(c)
        # fused: total = hidden + fused; out = modulate(Norm(total))
        moded, hidden_states = Norm(
            rms=self.rms_norm, eps=self.norm_eps, name="norm_2")(
            hidden_states, prenorm=False, branch=fused,
            shift=shift_mlp, scale=scale_mlp)
        mlp_cls = GatedMLP if self.use_gated_mlp else Mlp
        mlp_out = mlp_cls(4 * self.dim, act=gelu_tanh, dtype=self.dtype,
                          name="mlp")(moded)
        if self.defer_tail:
            return hidden_states, residual, (mlp_out, gate_mlp)
        hidden_states = hidden_states + gate_mlp[:, None, :] * mlp_out
        return hidden_states, residual
