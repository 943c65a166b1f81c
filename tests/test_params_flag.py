"""sample.py --params {ema,raw}: the sampler loads the EMA shadow by
default (reference sample.py uses state_dict["ema"]) and the raw optimizer
params on request — the lever behind TRAINING.md's EMA-vs-raw comparison."""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from dimsum_tpu.models.dim import DiM, DiMConfig


def _tiny_cfg():
    return DiMConfig(img_resolution=8, patch_size=2, in_channels=4,
                     hidden_size=32, depth=2, num_classes=10, rms_norm=True,
                     block_type="combined", cond_mamba=True,
                     use_attn_every_k_layers=2, learnable_pe=True,
                     scan_impl="xla")


def test_load_params_ema_vs_raw(tmp_path):
    from sample import load_params
    from dimsum_tpu.parallel import create_optimizer, create_train_state
    from dimsum_tpu.utils.ckpt import save_checkpoint

    cfg = _tiny_cfg()
    model = DiM(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, 8, 8)), jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32))["params"]
    state = create_train_state(params, create_optimizer())
    # make raw and ema visibly different
    state = state.replace(
        ema_params=jax.tree.map(lambda p: p + 1.0, state.params))
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state, step=7)

    def _load(which):
        args = argparse.Namespace(ckpt=ckpt_dir, params=which)
        return load_params(args, model, cfg)

    ema, raw = _load("ema"), _load("raw")
    leaf_e = jax.tree.leaves(ema)[0]
    leaf_r = jax.tree.leaves(raw)[0]
    np.testing.assert_allclose(np.asarray(leaf_e),
                               np.asarray(leaf_r) + 1.0, rtol=0, atol=0)
