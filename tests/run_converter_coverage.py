"""Full-scale converter key-coverage (VERDICT r4 item 6).

Builds the ACTUAL reference models at their published full sizes on CPU --
DiM-L/2 / DiM-XL/2 with the scripts/train.sh ImageNet-256 flags
(`/root/reference/scripts/train.sh:88-110`, zoo constructors
`models_dim.py:2174-2186`) and reference DiT-B/2 (`models_dit.py:402`) --
through tests/refshim.py, takes the exact full-size state-dict KEY SET,
and pushes it through `convert_torch_state_dict(strict=True)` against a
`jax.eval_shape` template of my model: every reference key must be
consumed and every template leaf filled at matching shape.  Names/shape
coverage only (logit parity is tests/test_reference_parity.py at small
config); the moment real published weights arrive nothing can surprise.

Run standalone: ``python tests/run_converter_coverage.py <name>``
with <name> in {DiM-L/2, DiM-XL/2, DiT-B/2}.  Invoked as a subprocess by
tests/test_converter_coverage.py (refshim mutates sys.modules).
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import refshim  # noqa: E402

# published ImageNet-256 recipe (reference scripts/train.sh:88-110):
# latent 32x32x4, combined block, CondMamba, RMSNorm + fused add-norm,
# learnable PE, shared DiT attention every 4 layers
IMG, CIN, NCLS = 32, 4, 1000
RECIPE = dict(rms_norm=True, fused_add_norm=True, scan_type="none",
              block_type="combined", cond_mamba=True,
              use_attn_every_k_layers=4, learnable_pe=True)


def run_dim(ns, name: str) -> None:
    import torch

    torch.manual_seed(0)
    ref = ns.models_dim.DiM_models[name](
        img_resolution=IMG, in_channels=CIN, num_classes=NCLS,
        label_dropout=0.15, **RECIPE)
    sd = {k: np.asarray(v.detach().numpy())
          for k, v in ref.state_dict().items()}
    n_params = sum(int(np.prod(v.shape)) for v in sd.values())

    from dimsum_tpu.models.dim import DiM, DiM_models
    from dimsum_tpu.utils.ckpt import convert_torch_state_dict

    cfg = DiM_models[name](
        img_resolution=IMG, in_channels=CIN, num_classes=NCLS,
        label_dropout=0.15, **RECIPE)
    model = DiM(cfg)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, CIN, IMG, IMG)), jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32))["params"]
    params = convert_torch_state_dict(sd, template, strict=True)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    print(json.dumps({"model": name, "torch_keys": len(sd),
                      "torch_params": n_params, "flax_leaves": n_leaves,
                      "strict": True}))


def run_dit(ns, name: str) -> None:
    import importlib

    import torch

    models_dit = importlib.import_module("models_dit")
    torch.manual_seed(0)
    ref = models_dit.DiT_models[name](
        img_resolution=IMG, in_channels=CIN, num_classes=NCLS,
        label_dropout=0.1, learn_sigma=False)
    sd = {k: np.asarray(v.detach().numpy())
          for k, v in ref.state_dict().items()}

    from dimsum_tpu.models.dit import DiT, DiT_models
    from dimsum_tpu.utils.ckpt import convert_torch_state_dict

    cfg = DiT_models[name](img_resolution=IMG, in_channels=CIN,
                           num_classes=NCLS, label_dropout=0.1,
                           learn_sigma=False)
    model = DiT(cfg)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, CIN, IMG, IMG)), jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32))["params"]
    params = convert_torch_state_dict(sd, template, strict=True)
    print(json.dumps({"model": name, "torch_keys": len(sd),
                      "flax_leaves": len(jax.tree_util.tree_leaves(params)),
                      "strict": True}))


def main(name: str) -> None:
    ns = refshim.install()
    if name.startswith("DiT"):
        run_dit(ns, name)
    else:
        run_dim(ns, name)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "DiM-L/2")
