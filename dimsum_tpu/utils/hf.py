"""HF Mamba LM checkpoint loading.

Reference: `/root/reference/mamba/mamba_ssm/utils/hf.py` (hub download +
state-dict load).  Zero-egress here: weights come from a local
pytorch_model.bin / .safetensors of a `state_spaces/mamba-*` checkpoint.

HF naming -> our MambaLMHeadModel params:
  backbone.embedding.weight                -> embedding/embedding
  backbone.layers.N.norm.weight            -> layers_N/norm_weight
  backbone.layers.N.mixer.in_proj.weight   -> layers_N/mixer/in_proj/kernel^T
  ... (conv1d, x_proj, dt_proj, A_log, D, out_proj as in the DiM mixer)
  backbone.norm_f.weight                   -> norm_f_weight
  lm_head.weight                           -> tied to embedding (checked)
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np
import jax.numpy as jnp


def convert_hf_mamba_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    out: dict = {}

    def put(path, val):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(val)

    for name, arr in sd.items():
        arr = np.asarray(arr)
        if name == "backbone.embedding.weight":
            put(("embedding", "embedding"), arr)
            continue
        if name == "backbone.norm_f.weight":
            put(("norm_f_weight",), arr)
            continue
        if name == "lm_head.weight":
            continue  # tied to the embedding
        m = re.match(r"backbone\.layers\.(\d+)\.(.+)", name)
        if not m:
            raise ValueError(f"unexpected HF key {name}")
        layer, rest = f"layers_{m.group(1)}", m.group(2)
        if rest == "norm.weight":
            put((layer, "norm_weight"), arr)
        elif rest == "mixer.in_proj.weight":
            put((layer, "mixer", "in_proj", "kernel"), arr.T)
        elif rest == "mixer.conv1d.weight":
            put((layer, "mixer", "conv1d_kernel"), arr[:, 0, :])
        elif rest == "mixer.conv1d.bias":
            put((layer, "mixer", "conv1d_bias"), arr)
        elif rest == "mixer.x_proj.weight":
            put((layer, "mixer", "x_proj", "kernel"), arr.T)
        elif rest == "mixer.dt_proj.weight":
            put((layer, "mixer", "dt_proj_kernel"), arr.T)
        elif rest == "mixer.dt_proj.bias":
            put((layer, "mixer", "dt_proj_bias"), arr)
        elif rest == "mixer.A_log":
            put((layer, "mixer", "A_log"), arr)
        elif rest == "mixer.D":
            put((layer, "mixer", "D"), arr)
        elif rest == "mixer.out_proj.weight":
            put((layer, "mixer", "out_proj", "kernel"), arr.T)
        else:
            raise ValueError(f"unexpected HF key {name}")
    return out


def load_hf_mamba(path: str):
    """Load a local HF mamba checkpoint -> (MambaLMConfig, params dict)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = {k: v.float().numpy() for k, v in
              torch.load(path, map_location="cpu",
                         weights_only=False).items()}
    from dimsum_tpu.models.lm import MambaLMConfig

    n_layer = 1 + max(
        int(re.match(r"backbone\.layers\.(\d+)\.", k).group(1))
        for k in sd if k.startswith("backbone.layers."))
    d_model = sd["backbone.embedding.weight"].shape[1]
    vocab = sd["backbone.embedding.weight"].shape[0]
    cfg = MambaLMConfig(d_model=d_model, n_layer=n_layer, vocab_size=vocab,
                        pad_vocab_size_multiple=1)
    return cfg, {"params": convert_hf_mamba_state_dict(sd)}
