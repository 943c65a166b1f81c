"""Model factory: build DiM/DiT from a CLI-style config namespace.

Reference: `/root/reference/dimsum/create_model.py` (note the latent-space
resolution: img_resolution = image_size // 8).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from dimsum_tpu.models.dim import DiM, DiM_models
from dimsum_tpu.models.dit import DiT, DiT_models


def create_model(args: Any, ep_mesh: Any = None) -> Tuple[Any, Any]:
    """Returns (module, config).  `args` mirrors the reference argparse
    namespace (train.py:496-602).  `ep_mesh` (TPU extension): a (data,
    model) Mesh -- MoE experts are then sharded over its 'model' axis."""
    dtype = jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
    if "DiM" in args.model:
        cfg = DiM_models[args.model](
            moe_ep_axis="model" if ep_mesh is not None else None,
            moe_ep_mesh=ep_mesh,
            img_resolution=args.image_size // 8,
            in_channels=args.num_in_channels,
            label_dropout=args.label_dropout,
            num_classes=args.num_classes,
            gated_linear_unit=args.gated_linear_unit,
            routing_mode=args.routing_mode,
            num_moe_experts=args.num_moe_experts,
            is_moe=args.is_moe,
            learn_sigma=args.learn_sigma,
            scan_type=args.bimamba_type,
            pe_type=args.pe_type,
            block_type=args.block_type,
            cond_mamba=args.cond_mamba,
            use_cond_init=getattr(args, "cond_init", False),
            scanning_continuity=args.scanning_continuity,
            enable_fourier_layers=args.enable_fourier_layers,
            drop_path=args.drop_path,
            rms_norm=args.rms_norm,
            fused_add_norm=args.fused_add_norm,
            learnable_pe=args.learnable_pe,
            use_final_norm=args.use_final_norm,
            use_attn_every_k_layers=args.use_attn_every_k_layers,
            use_gated_mlp=not args.not_use_gated_mlp,
            dtype=dtype,
            grad_checkpoint=getattr(args, "grad_checkpoint", False),
            remat_policy=getattr(args, "remat_policy", None),
        )
        return DiM(cfg), cfg
    elif "DiT" in args.model:
        cfg = DiT_models[args.model](
            img_resolution=args.image_size // 8,
            in_channels=args.num_in_channels,
            label_dropout=args.label_dropout,
            num_classes=args.num_classes,
            learn_sigma=args.learn_sigma,
            dtype=dtype,
        )
        return DiT(cfg), cfg
    raise ValueError(f"unknown model {args.model}")
