"""DiM backbone: PatchEmbed -> PE -> N hybrid blocks (+ DiT attention every k
layers) -> FinalLayer -> unpatchify; plus the model zoo.

Reference: `/root/reference/dimsum/models_dim.py` (DiM :1557-1930,
create_block :2001-2160, zoo :2163-2236).

Config notes (mirroring the reference):
  * block_type "raw" triples the depth (:1594-1597).
  * scan_type "none" alternates per-layer reverse=(i%2>0), transpose=(i%4>=2)
    (:1686-1688); zigzag scan types instead carry per-layer permutations.
  * use_attn_every_k_layers inserts a (shared by default) DiTBlock with 16
    heads after every k-th block (:1855-1860).
  * CFG batching and channel-split semantics follow forward_with_cfg
    (:1886-1902) and the power-cos ada-CFG variant (:1904-1924).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from dimsum_tpu.models.blocks import (
    DiMBlockCombined,
    DiMBlockWindow,
    DiTBlock,
    MixerBlockCore,
    MoEBlock,
    Norm,
    WaveDiMBlock,
    materialize_pending,
    pending_tail_mode,
)
from dimsum_tpu.models.embedders import (
    AdaInPosCNN,
    FinalLayer,
    LabelEmbedder,
    PatchEmbed,
    TimestepEmbedder,
    apply_rotary,
    get_2d_sincos_pos_embed,
    get_2d_sincos_rotary_embed,
    unpatchify,
)
from dimsum_tpu.ops.scan_orders import SCAN_ZOO, reverse_permut_np


@dataclasses.dataclass(frozen=True)
class DiMConfig:
    img_resolution: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1024
    depth: int = 16
    label_dropout: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = False
    rms_norm: bool = False
    residual_in_fp32: bool = True
    fused_add_norm: bool = False  # kept for config parity; jnp always fuses
    scan_type: str = "none"       # "none" | "v2" | "<zoo>_<n>"
    num_moe_experts: int = 8
    moe_ep_axis: Optional[str] = None  # TPU extension: shard experts over
    moe_ep_mesh: Any = None            # this mesh axis (GSPMD EP; blocks.py)
    moe_capacity_factor: float = 2.0
    add_bias_linear: bool = False
    gated_linear_unit: bool = True
    routing_mode: str = "top1"
    is_moe: bool = False
    pe_type: str = "ape"          # "ape" | "rope" | "cpe"
    block_type: str = "linear"    # linear|raw|wave|window|combined|
    #                               combined_fourier|combined_einfft
    cond_mamba: bool = False
    use_cond_init: bool = False  # opt-in: actually seed the scan state with
    #                              cond_proj(c) (dead in the reference; 2.1)
    scanning_continuity: bool = False
    enable_fourier_layers: bool = False
    learnable_pe: bool = False
    drop_path: float = 0.0
    use_final_norm: bool = False
    use_attn_every_k_layers: int = -1
    use_gated_mlp: bool = True
    use_independent_attn: bool = False
    dtype: Any = jnp.float32
    scan_impl: Optional[str] = None
    grad_checkpoint: bool = False  # remat each block (reference DiT's
    #                                set_gradient_checkpointing equivalent)
    remat_policy: Optional[str] = None  # what remat SAVES instead of
    #   recomputing: None="nothing" (classic full remat), "dots"=every
    #   matmul output, "scan"=the selective-scan kernel outputs (tagged
    #   checkpoint_name "scan_out"), "dots_scan"=both.  Trades HBM for
    #   skipping the expensive recomputes in the backward replay.
    seq_axis: Optional[str] = None  # TPU extension: sequence parallelism --
    seq_mesh: Any = None            # every mixer runs its halo conv + two-
    #                                 pass scan in a shard_map island over
    #                                 this mesh axis; the rest of the model
    #                                 stays GSPMD (for L=1024+ configs;
    #                                 requires scan_type "none")

    @property
    def eff_depth(self) -> int:
        d = self.depth * 3 if self.block_type == "raw" else self.depth
        if self.use_independent_attn and self.use_attn_every_k_layers > 0:
            d = d - d // self.use_attn_every_k_layers
        return d

    @property
    def num_attn_blocks(self) -> int:
        if self.use_attn_every_k_layers <= 0:
            return 0
        base = self.depth * 3 if self.block_type == "raw" else self.depth
        if self.use_independent_attn:
            return base // self.use_attn_every_k_layers - 1
        return 1

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @property
    def grid_size(self) -> int:
        return self.img_resolution // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2


def _remat_policy(name: Optional[str]):
    """Map DiMConfig.remat_policy to a jax.checkpoint policy.

    None: save nothing (classic full remat).  "dots": keep every matmul
    output resident so the backward replay skips the MXU work.  "scan":
    keep the selective-scan kernel outputs (tagged "scan_out" in
    models/mamba.py) so the replay skips the Pallas scans.  "dots_scan":
    both.  "save:A+B+..." composes freely from {dots, scan_out, attn_out,
    conv_out} -- the tagged sites are the scan kernels (mamba.py), the
    attention outputs (attention.py), and the conv prologues (mamba.py),
    e.g. "save:dots+scan_out+attn_out"."""
    if name in (None, "", "none"):
        return None
    cp = jax.checkpoint_policies
    if name == "dots":
        return cp.dots_saveable
    if name == "scan":
        return cp.save_only_these_names("scan_out")
    if name == "dots_scan":
        return cp.save_from_both_policies(
            cp.dots_saveable, cp.save_only_these_names("scan_out"))
    if name.startswith("save:"):
        known = {"scan_out", "attn_out", "conv_out"}
        parts = [p for p in name[len("save:"):].split("+") if p]
        tags = [p for p in parts if p != "dots"]
        bad = set(tags) - known
        if not parts or bad:
            raise ValueError(
                f"remat_policy {name!r}: unknown tags {sorted(bad)}; "
                f"compose from 'dots' and {sorted(known)}")
        pol = cp.save_only_these_names(*tags) if tags else None
        if "dots" in parts:
            pol = (cp.dots_saveable if pol is None
                   else cp.save_from_both_policies(cp.dots_saveable, pol))
        return pol
    raise ValueError(f"unknown remat_policy {name!r}")


def _gen_paths(grid_size: int, scan_type: str, depth: int):
    """Per-layer scan-path buffers (reference gen_paths, :1640-1658)."""
    zoo_name, num = scan_type.split("_")
    paths = SCAN_ZOO[zoo_name](grid_size)[: int(num)]
    revs = [reverse_permut_np(p) for p in paths]
    rows = depth * len(paths)
    fwd = np.stack([paths[i % len(paths)] for i in range(rows)]).astype(np.int32)
    bwd = np.stack([revs[i % len(revs)] for i in range(rows)]).astype(np.int32)
    return fwd, bwd


def _mixer_kwargs_for(layer_idx: int, cfg: DiMConfig, paths, paths2):
    mk = dict(
        layer_idx=layer_idx,
        scan_type=cfg.scan_type,
        scan_impl=cfg.scan_impl,
    )
    if cfg.seq_axis is not None:
        mk["seq_axis"] = cfg.seq_axis
        mk["seq_mesh"] = cfg.seq_mesh
    if cfg.cond_mamba:
        mk["d_cond"] = cfg.hidden_size
        mk["use_cond_init"] = cfg.use_cond_init
    zig = cfg.scan_type.split("_")[0] in ("zigma", "sweep", "jpeg")
    if zig:
        mk["zigzag_paths"] = paths[0]
        mk["zigzag_paths_reverse"] = paths[1]
    mk2 = dict(mk)
    if cfg.block_type == "combined_fourier":
        mk2 = dict(layer_idx=layer_idx, scan_type="jpeg_2",
                   scan_impl=cfg.scan_impl, d_cond=cfg.hidden_size,
                   zigzag_paths=paths2[0],
                   zigzag_paths_reverse=paths2[1])
    return mk, mk2


def make_dim_block(i: int, cfg: DiMConfig, paths, paths2,
                   drop_path_rate: float = 0.0, name=None,
                   defer_tail: bool = False):
    """create_block dispatch (reference :2001-2160) as a free function so
    callers outside a module context (e.g. the pipeline-parallel stage
    templates) can build unbound blocks with name=None."""
    if cfg.is_moe and i % 2 != 0:
        # the reference's MoEBlock receives no drop_path (:2150-2157)
        return MoEBlock(
            dim=cfg.hidden_size, rms_norm=cfg.rms_norm,
            residual_in_fp32=cfg.residual_in_fp32,
            num_moe_experts=cfg.num_moe_experts,
            add_bias_linear=cfg.add_bias_linear,
            gated_linear_unit=cfg.gated_linear_unit,
            routing_mode=cfg.routing_mode,
            ep_axis=cfg.moe_ep_axis, ep_mesh=cfg.moe_ep_mesh,
            capacity_factor=cfg.moe_capacity_factor, dtype=cfg.dtype,
            name=name)

    mk, mk2 = _mixer_kwargs_for(i, cfg, paths, paths2)
    alternate = cfg.scan_type == "none"
    reverse = alternate and (i % 2 > 0)
    transpose = alternate and (i % 4 >= 2)
    common = dict(
        dim=cfg.hidden_size, mixer_kwargs=mk, rms_norm=cfg.rms_norm,
        residual_in_fp32=cfg.residual_in_fp32,
        drop_path_rate=drop_path_rate,
        dtype=cfg.dtype, name=name)

    if cfg.block_type == "raw":
        return MixerBlockCore(
            no_ffn=True, reverse=reverse, transpose=transpose,
            scanning_continuity=cfg.scanning_continuity, **common)
    if cfg.block_type == "wave":
        return WaveDiMBlock(
            reverse=reverse, transpose=transpose,
            scanning_continuity=cfg.scanning_continuity,
            window_scan=False, **common)
    if cfg.block_type == "window":
        return DiMBlockWindow(
            reverse=False, transpose=reverse, shift_window=False,
            use_gated_mlp=cfg.use_gated_mlp, **common)
    if cfg.block_type in ("combined", "combined_fourier",
                          "combined_einfft"):
        variant = {"combined": "wave", "combined_fourier": "dct",
                   "combined_einfft": "einfft"}[cfg.block_type]
        return DiMBlockCombined(
            reverse=reverse, transpose=transpose,
            scanning_continuity=cfg.scanning_continuity,
            use_gated_mlp=cfg.use_gated_mlp, freq_variant=variant,
            mixer_kwargs_2=mk2, defer_tail=defer_tail, **common)
    # default: "linear"
    return MixerBlockCore(
        no_ffn=False, reverse=reverse, transpose=transpose,
        scanning_continuity=cfg.scanning_continuity,
        use_gated_mlp=cfg.use_gated_mlp, **common)


class DiM(nn.Module):
    cfg: DiMConfig

    @staticmethod
    def _drop_path_rates(cfg: DiMConfig):
        """Stochastic-depth decay rule (reference :1634-1636): block i gets
        inter_dpr[i] where inter_dpr = [0.0] + linspace(0, p, depth); the
        auxiliary fourier blocks get dpr[i] and the final norm_f merge the
        full rate."""
        dpr = np.linspace(0.0, cfg.drop_path, cfg.eff_depth).tolist()
        inter_dpr = [0.0] + dpr
        return inter_dpr, dpr

    def _make_block(self, i: int, cfg: DiMConfig, paths, paths2,
                    drop_path_rate: float = 0.0, defer_tail: bool = False):
        return make_dim_block(i, cfg, paths, paths2, drop_path_rate,
                              name=f"blocks_{i}", defer_tail=defer_tail)

    @nn.compact
    def __call__(self, x, t, y=None, train: bool = False,
                 force_drop_ids=None):
        """x: (N, C, H, W) latents; t: (N,) times in [0, 1]; y: (N,) labels."""
        cfg = self.cfg
        N = x.shape[0]

        y_embedder = LabelEmbedder(cfg.num_classes, cfg.hidden_size,
                                   cfg.label_dropout, name="y_embedder")
        if y is None:
            y = jnp.full((N,), y_embedder.in_channels - 1, jnp.int32)
        t_emb = TimestepEmbedder(cfg.hidden_size, dtype=cfg.dtype,
                                 name="t_embedder")(t)
        y_emb = y_embedder(y, train=train, force_drop_ids=force_drop_ids)
        c = (t_emb + y_emb).astype(cfg.dtype)

        x = PatchEmbed(cfg.patch_size, cfg.hidden_size, dtype=cfg.dtype,
                       name="x_embedder")(x.astype(cfg.dtype))

        grid = cfg.grid_size
        if cfg.pe_type == "ape":
            pe_init = get_2d_sincos_pos_embed(cfg.hidden_size, grid)[None]
            pos_embed = self.param(
                "pos_embed", lambda key, shape: jnp.asarray(pe_init),
                (1, cfg.num_patches, cfg.hidden_size))
            if not cfg.learnable_pe:
                pos_embed = jax.lax.stop_gradient(pos_embed)
            x = x + pos_embed.astype(cfg.dtype)
        elif cfg.pe_type == "rope":
            emb_sin, emb_cos = get_2d_sincos_rotary_embed(
                cfg.hidden_size, grid)
            x = apply_rotary(x, jnp.asarray(emb_sin, cfg.dtype),
                             jnp.asarray(emb_cos, cfg.dtype))
        elif cfg.pe_type == "cpe":
            x = AdaInPosCNN(cfg.hidden_size, dtype=cfg.dtype,
                            name="pos_cnn")(x, c, H=grid, W=grid)
        else:
            raise ValueError(f"unsupported pe_type {cfg.pe_type}")

        zig = cfg.scan_type.split("_")[0] in ("zigma", "sweep", "jpeg")
        paths = (_gen_paths(grid, cfg.scan_type, cfg.eff_depth)
                 if zig else (None, None))
        paths2 = (_gen_paths(grid, "jpeg_2", cfg.eff_depth)
                  if cfg.block_type == "combined_fourier" else (None, None))

        attn_every = cfg.use_attn_every_k_layers
        shared_attn = None
        if attn_every > 0 and not cfg.use_independent_attn:
            shared_attn = DiTBlock(cfg.hidden_size, 16,
                                   use_gated_mlp=cfg.use_gated_mlp,
                                   dtype=cfg.dtype, name="attn_block")

        residual = None
        freq_residual = None
        attn_idx = 0
        inter_dpr, dpr = self._drop_path_rates(cfg)
        # cross-block pending-tail (DIMSUM_PENDING_TAIL, blocks.py): combined
        # blocks return the tail FFN add unmaterialized and the next block's
        # top add+norm absorbs it; disabled under remat (the pending tuple
        # would cross the checkpoint boundary)
        pmode = 0 if cfg.grad_checkpoint else pending_tail_mode()
        pending = None
        for i in range(cfg.eff_depth):
            block = self._make_block(i, cfg, paths, paths2,
                                     drop_path_rate=inter_dpr[i],
                                     defer_tail=pmode > 0)
            if cfg.grad_checkpoint:
                x, residual = nn.remat(
                    lambda mdl, *a: mdl(*a, train=train),
                    policy=_remat_policy(cfg.remat_policy))(
                    block, x, residual, c)
            elif pmode > 0 and isinstance(block, DiMBlockCombined):
                x, residual, new_pending = block(
                    x, residual, c, train=train, pending=pending)
                pending = new_pending
            else:
                x = materialize_pending(x, pending)
                pending = None
                x, residual = block(x, residual, c, train=train)
            if cfg.enable_fourier_layers:
                x = materialize_pending(x, pending)
                pending = None
                # auxiliary frequency blocks after each main block
                # (reference :1699-1723,1847-1853; NOTE the reference's own
                # construction crashes -- gen_paths arity bug at :1702 --
                # so this is the working realization of that intent)
                x, freq_residual = WaveDiMBlock(
                    dim=cfg.hidden_size, mixer_kwargs=dict(
                        layer_idx=i, scan_type="none",
                        d_cond=cfg.hidden_size, scan_impl=cfg.scan_impl),
                    rms_norm=cfg.rms_norm,
                    residual_in_fp32=cfg.residual_in_fp32,
                    reverse=(i % 2 > 0), transpose=False,
                    scanning_continuity=cfg.scanning_continuity,
                    window_scan=False, drop_path_rate=dpr[i],
                    dtype=cfg.dtype,
                    name=f"fourier_blocks_{i}")(x, freq_residual, c,
                                                train=train)
            if attn_every > 0 and (i + 1) % attn_every == 0:
                x = materialize_pending(x, pending)
                pending = None
                if cfg.use_independent_attn:
                    if attn_idx < cfg.num_attn_blocks:
                        x = DiTBlock(cfg.hidden_size, 16,
                                     use_gated_mlp=cfg.use_gated_mlp,
                                     dtype=cfg.dtype,
                                     name=f"attn_block_{attn_idx}")(x, c)
                        attn_idx += 1
                else:
                    x = shared_attn(x, c)

        x = materialize_pending(x, pending)
        pending = None

        if cfg.use_final_norm:
            # model-level DropPath at the final merge (reference :1867-1880,
            # full rate)
            if train and cfg.drop_path > 0.0 and residual is not None:
                from dimsum_tpu.models.blocks import drop_path_fn
                x = drop_path_fn(x, cfg.drop_path,
                                 self.make_rng("drop_path"))
            x = Norm(rms=cfg.rms_norm, eps=1e-5, name="norm_f")(
                x, residual, prenorm=False,
                residual_in_fp32=cfg.residual_in_fp32)

        x = FinalLayer(cfg.patch_size, cfg.out_channels, dtype=cfg.dtype,
                       name="final_layer")(x, c)
        return unpatchify(x.astype(jnp.float32), cfg.patch_size,
                          cfg.out_channels)


def forward_with_cfg(model_apply, params, x, t, y, cfg_scale: float = 1.0,
                     in_channels: int = 4, **kwargs):
    """Classifier-free guidance wrapper (reference :1886-1902).

    x is the CFG-doubled batch [cond_half; cond_half]; y is [labels; null].
    Guidance is applied to the first `in_channels` output channels only.
    """
    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    out = model_apply(params, combined, t, y, **kwargs)
    eps, rest = out[:, :in_channels], out[:, in_channels:]
    cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
    half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
    eps = jnp.concatenate([half_eps, half_eps], axis=0)
    return jnp.concatenate([eps, rest], axis=1)


def forward_with_adacfg(model_apply, params, x, t, y, cfg_scale: float = 3.8,
                        scale_pow: float = 4.0, in_channels: int = 4,
                        **kwargs):
    """Power-cos scaled CFG (reference :1904-1924)."""
    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    out = model_apply(params, combined, t, y, **kwargs)
    eps, rest = out[:, :in_channels], out[:, in_channels:]
    cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
    scale_step = (1 - jnp.cos(((1 - t) ** scale_pow) * math.pi)) * 0.5
    real_scale = (cfg_scale - 1) * scale_step + 1
    real_scale = real_scale[: x.shape[0] // 2].reshape(-1, 1, 1, 1)
    half_eps = uncond_eps + real_scale * (cond_eps - uncond_eps)
    eps = jnp.concatenate([half_eps, half_eps], axis=0)
    return jnp.concatenate([eps, rest], axis=1)


# ------------------------------ model zoo ---------------------------------


def _zoo_cfg(depth, hidden, patch, **kwargs) -> DiMConfig:
    return DiMConfig(depth=depth, hidden_size=hidden, patch_size=patch,
                     **kwargs)


DiM_models = {
    "DiM-XL/2": lambda **kw: _zoo_cfg(24, 1152, 2, **kw),
    "DiM-L/2": lambda **kw: _zoo_cfg(16, 1024, 2, **kw),
    "DiM-L/2-v1": lambda **kw: _zoo_cfg(20, 1024, 2, **kw),
    "DiM-B/2": lambda **kw: _zoo_cfg(12, 768, 2, **kw),
    "DiM-L/4": lambda **kw: _zoo_cfg(16, 1024, 4, **kw),
    "DiM-L/4-v1": lambda **kw: _zoo_cfg(20, 1024, 4, **kw),
    # small configs for tests/smoke runs (not in the reference zoo)
    "DiM-S/2": lambda **kw: _zoo_cfg(4, 256, 2, **kw),
    # depth 8: the smallest depth exercising pipeline stages of 4 blocks
    # (the i%4 reverse/transpose period) -- pp smoke runs
    "DiM-S8/2": lambda **kw: _zoo_cfg(8, 256, 2, **kw),
}
