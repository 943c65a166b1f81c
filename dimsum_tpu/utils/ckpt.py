"""Checkpointing: orbax save/restore (rolling content + numbered snapshots,
mirroring the reference's two artifacts, train.py:353-376) and a
torch-state-dict -> flax converter for loading published DiMSUM checkpoints
(e.g. haopt/dimsum-L2-imagenet256, "ema" key; download.py:26-27).

Layout maps handled by the converter:
  * nn.Linear weight (out, in)        -> Dense kernel (in, out)       [T]
  * Conv1d depthwise (D, 1, W)        -> conv1d_kernel (D, W)
  * PatchEmbed conv (D, C, p, p)      -> proj kernel (C*p*p, D)
  * Embedding weight                  -> Embed embedding
  * Sequential adaLN "…modulation.1"  -> AdaLN "…modulation/fc"
  * t_embedder.mlp.{0,2}              -> mlp_0 / mlp_2
  * mixer dt_proj/conv1d params       -> flattened *_kernel / *_bias names
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# torch -> flax name conversion
# ---------------------------------------------------------------------------


def _flax_path_for(torch_name: str):
    """Map a torch state-dict key to a flax params path (tuple of keys) and a
    transform tag in {"linear", "conv1d", "patch", "embed", "raw"}."""
    name = torch_name
    # module-list indices: blocks.0 -> blocks_0, local_experts.3 -> ..._3
    name = re.sub(r"\bblocks\.(\d+)", r"blocks_\1", name)
    name = re.sub(r"\blocal_experts\.(\d+)", r"local_experts_\1", name)
    name = re.sub(r"\battn_block\.(\d+)", r"attn_block_\1", name)
    name = re.sub(r"\bfourier_blocks\.(\d+)", r"fourier_blocks_\1", name)
    name = re.sub(r"\bt_embedder\.mlp\.0", "t_embedder.mlp_0", name)
    name = re.sub(r"\bt_embedder\.mlp\.2", "t_embedder.mlp_2", name)
    name = name.replace("adaLN_modulation.1", "adaLN_modulation.fc")
    name = name.replace("embedding_table.weight", "embedding_table.embedding")
    # cpe PosCNN: proj.0 (Sequential) -> proj
    name = re.sub(r"\bpos_cnn\.proj\.0", "pos_cnn.proj", name)

    parts = name.split(".")

    # final_layer / pos_cnn adaLN live as a flat Dense named *_fc
    if "final_layer" in parts or "pos_cnn" in parts:
        try:
            i = parts.index("adaLN_modulation")
            parts = parts[:i] + ["adaLN_modulation_fc"] + parts[i + 2:] \
                if parts[i + 1] == "fc" else parts
        except ValueError:
            pass

    # mamba mixer flattened params
    joined = ".".join(parts)
    m = re.search(r"(conv1d(?:_b)?)\.(weight|bias)$", joined)
    if m and "mixer" in parts:
        stem = parts[:-2]
        suffix = "kernel" if m.group(2) == "weight" else "bias"
        return tuple(stem + [f"{m.group(1)}_{suffix}"]), (
            "conv1d" if suffix == "kernel" else "raw")
    m = re.search(r"(dt_proj(?:_b)?)\.(weight|bias)$", joined)
    if m and "mixer" in parts:
        stem = parts[:-2]
        if m.group(2) == "weight":
            return tuple(stem + [f"{m.group(1)}_kernel"]), "linear"
        return tuple(stem + [f"{m.group(1)}_bias"]), "raw"

    if parts[-1] == "weight":
        if parts[-2].startswith(("norm", "q_norm", "k_norm")):
            # LayerNorm/RMSNorm scale: keep name and layout
            return tuple(parts), "raw"
        if "x_embedder" in parts and "proj" in parts:
            return tuple(parts[:-1]), "patch"
        return tuple(parts[:-1] + ["kernel"]), "linear"
    if parts[-1] == "bias":
        return tuple(parts[:-1] + ["bias"]), "raw"
    return tuple(parts), "raw"


def _get(tree, path):
    node = tree
    for p in path:
        if p not in node:
            return None
        node = node[p]
    return node


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_torch_state_dict(
    state_dict: Dict[str, np.ndarray],
    params_template: Optional[Dict] = None,
    strict: bool = True,
):
    """Convert a torch state dict (name -> numpy array) to a flax params
    tree.  If a template is given, shapes are validated against it and
    missing/unexpected keys raise (strict) or warn."""
    out: Dict[str, Any] = {}
    norm_buffers = ("zigzag_paths", "zigzag_paths_reverse", "emb_sin",
                    "emb_cos", "dwt.", "idwt.", "dct_conv", "idct_conv",
                    "filters", "w_ll", "w_lh", "w_hl", "w_hh")
    skipped = []
    for name, arr in state_dict.items():
        if any(b in name for b in norm_buffers):
            skipped.append(name)  # frozen buffers, regenerated on our side
            continue
        arr = np.asarray(arr)
        path, kind = _flax_path_for(name)
        if kind == "linear":
            arr = arr.T
        elif kind == "conv1d":
            arr = arr[:, 0, :]  # (D, 1, W) -> (D, W)
        elif kind == "patch":
            d = arr.shape[0]
            arr = arr.reshape(d, -1).T  # (D, C, p, p) -> (C*p*p, D)
            path = path + ("kernel",)
        if name == "pos_embed":
            path = ("pos_embed",)
        _set(out, path, jnp.asarray(arr))

    if params_template is not None:
        tmpl_flat = jax.tree_util.tree_flatten_with_path(params_template)[0]
        got_flat = jax.tree_util.tree_flatten_with_path(out)[0]

        def key_of(path):
            return tuple(str(getattr(k, "key", k)) for k in path)

        tmpl = {key_of(p): v for p, v in tmpl_flat}
        got = {key_of(p): v for p, v in got_flat}
        missing = sorted(set(tmpl) - set(got))
        unexpected = sorted(set(got) - set(tmpl))
        mismatched = sorted(
            k for k in set(tmpl) & set(got)
            if tuple(tmpl[k].shape) != tuple(got[k].shape))
        if strict and (missing or unexpected or mismatched):
            raise ValueError(
                f"checkpoint conversion mismatch:\n"
                f"  missing: {missing[:8]}{'...' if len(missing) > 8 else ''}\n"
                f"  unexpected: {unexpected[:8]}\n"
                f"  shape-mismatch: {[(k, tmpl[k].shape, got[k].shape) for k in mismatched[:8]]}")
    return out


def load_torch_checkpoint(path: str, key: str = "ema",
                          params_template=None, strict: bool = True,
                          adapt: bool = False):
    """Load a reference .pt checkpoint via torch (CPU) and convert.  The
    published inference checkpoints store weights under the "ema" key
    (reference download.py:26-27).  With adapt=True, resolution/patch
    mismatches are fixed by pos-embed interpolation and shape-adaptive
    slicing (reference train.py:205-236 warm-start behavior)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and key in ckpt:
        ckpt = ckpt[key]
    sd = {k: v.float().numpy() for k, v in ckpt.items()
          if hasattr(v, "numpy")}
    if adapt and params_template is not None:
        params = convert_torch_state_dict(sd, params_template, strict=False)
        return adapt_checkpoint(params, params_template)
    return convert_torch_state_dict(sd, params_template, strict=strict)


def adapt_checkpoint(params: Dict, template: Dict) -> Dict:
    """Warm-start adaptation across resolutions / patch sizes:

    * pos_embed: bicubic 2-D interpolation of the token grid (reference
      interpolate_pos_embed, models_dim.py:99-121);
    * patch-embed kernel / final-layer linear: shape-adaptive slice or
      zero-pad (reference train.py:205-236).
    Any other shape mismatch raises.
    """
    import jax

    def key_of(path):
        return tuple(str(getattr(k, "key", k)) for k in path)

    tmpl_flat = {key_of(p): v for p, v in
                 jax.tree_util.tree_flatten_with_path(template)[0]}
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy

    def fix(path, arr):
        key = key_of(path)
        want = tmpl_flat.get(key)
        if want is None or tuple(want.shape) == tuple(arr.shape):
            return arr
        name = "/".join(key)
        if "pos_embed" in name:
            _, L_old, D = arr.shape
            L_new = want.shape[1]
            old = int(round(L_old ** 0.5))
            new = int(round(L_new ** 0.5))
            grid = jnp.asarray(arr).reshape(1, old, old, D)
            resized = jax.image.resize(grid, (1, new, new, D), "bicubic")
            return resized.reshape(1, L_new, D)
        if "x_embedder" in name or ("final_layer" in name
                                    and "linear" in name):
            pad = [(0, max(0, w - a)) for w, a in
                   zip(want.shape, arr.shape)]
            arr = jnp.pad(jnp.asarray(arr), pad)
            slices = tuple(slice(0, w) for w in want.shape)
            return arr[slices]
        raise ValueError(f"cannot adapt {name}: {arr.shape} -> {want.shape}")

    return jax.tree_util.tree_map_with_path(fix, out)


# ---------------------------------------------------------------------------
# orbax-based native checkpointing
# ---------------------------------------------------------------------------


def save_checkpoint(ckpt_dir: str, state, step: int, keep: int = 5):
    """Numbered snapshot (reference train.py:366-376 equivalent)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep),
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def restore_checkpoint(ckpt_dir: str, state_template, step: Optional[int] = None):
    """Restore the latest (or a specific) snapshot into the template's
    structure.  Returns (state, step) or (None, None) when empty."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None, None
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            return None, None
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))
    return restored, step
