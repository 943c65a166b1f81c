"""Gradient-checkpointing (remat) correctness: every remat policy gives the
same loss and gradients as the un-rematted model (remat trades recompute for
memory, never values).  Policies: None = save nothing (classic), "dots" =
keep matmul outputs, "scan" = keep the tagged selective-scan outputs
(models/mamba.py checkpoint_name "scan_out"), "dots_scan" = both.
Reference anchor: DiT's set_gradient_checkpointing
(/root/reference/dimsum/models_dit.py:192,272-274)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dimsum_tpu.models.dim import DiM, DiMConfig


def _cfg(**kw):
    return DiMConfig(img_resolution=8, patch_size=2, in_channels=4,
                     hidden_size=32, depth=2, num_classes=10, rms_norm=True,
                     block_type="combined", cond_mamba=True,
                     use_attn_every_k_layers=2, learnable_pe=True,
                     scan_impl="xla", **kw)


def _loss_and_grads(cfg, params, x, t, y):
    model = DiM(cfg)

    def loss(p):
        return jnp.sum(model.apply({"params": p}, x, t, y) ** 2)

    return jax.value_and_grad(loss)(params)


@pytest.mark.parametrize("policy", [
    None, "dots", "scan", "dots_scan",
    # composable save: grammar over the tagged sites (scan kernels,
    # attention outputs, conv prologues)
    "save:dots+scan_out+attn_out", "save:scan_out+attn_out+conv_out",
    "save:attn_out", "save:conv_out"])
def test_remat_policies_match_no_remat(policy):
    cfg0 = _cfg()
    model = DiM(cfg0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    t = jnp.linspace(0.2, 0.8, 2)
    y = jnp.arange(2, dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x, t, y)["params"]

    l0, g0 = _loss_and_grads(cfg0, params, x, t, y)
    cfg1 = dataclasses.replace(cfg0, grad_checkpoint=True,
                               remat_policy=policy)
    l1, g1 = _loss_and_grads(cfg1, params, x, t, y)

    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (p0, a), (p1, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                                jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4,
            err_msg=f"grad mismatch at {p0} (policy={policy})")


def test_unknown_save_tag_raises():
    cfg = _cfg(grad_checkpoint=True, remat_policy="save:dots+bogus_tag")
    model = DiM(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    with pytest.raises(ValueError, match="unknown tags"):
        model.init(jax.random.PRNGKey(1), x, jnp.zeros((1,)),
                   jnp.zeros((1,), jnp.int32))


def test_unknown_policy_raises():
    cfg = _cfg(grad_checkpoint=True, remat_policy="bogus")
    model = DiM(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    with pytest.raises(ValueError, match="remat_policy"):
        model.init(jax.random.PRNGKey(1), x, jnp.zeros((1,)),
                   jnp.zeros((1,), jnp.int32))
