"""Stochastic depth (DropPath) tests.

Reference semantics: `/root/reference/dimsum/models_dim.py:1933-1962` (timm
drop_path: per-sample bernoulli(keep), kept samples scaled by 1/keep, active
only in training) applied at every block's add+norm residual merge
(`residual + drop_path(hidden_states)`, :294 and the analogous line of every
block class), with the per-layer decay rule inter_dpr = [0.0] + linspace(0,
p, depth) (:1634-1636).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dimsum_tpu.models.blocks import MixerBlockCore, drop_path_fn
from dimsum_tpu.models.dim import DiM, DiMConfig


def test_drop_path_fn_rate_and_scaling():
    n, rate = 4000, 0.3
    x = jnp.ones((n, 5, 3))
    y = np.asarray(drop_path_fn(x, rate, jax.random.PRNGKey(0)))
    per_sample = y[:, 0, 0]
    # every sample is either fully dropped or scaled by exactly 1/keep
    assert np.all((per_sample == 0.0) | np.isclose(per_sample, 1.0 / 0.7))
    # the mask broadcasts over non-batch dims
    assert np.all(y == per_sample[:, None, None])
    frac = float((per_sample == 0.0).mean())
    assert abs(frac - rate) < 0.03
    # expectation preserved
    assert abs(float(y.mean()) - 1.0) < 0.05


def _tiny_block(rate):
    return MixerBlockCore(
        dim=32, mixer_kwargs=dict(layer_idx=0, scan_type="none"),
        rms_norm=True, no_ffn=True, drop_path_rate=rate)


def test_block_applies_drop_at_residual_merge():
    """Returned residual must be residual_in + drop(hidden): samples are
    either untouched (dropped) or get hidden/keep added."""
    rate = 0.5
    block = _tiny_block(rate)
    k = jax.random.PRNGKey(1)
    h = jax.random.normal(k, (64, 16, 32))
    r = jax.random.normal(jax.random.fold_in(k, 1), (64, 16, 32))
    c = jnp.zeros((64, 32))
    params = block.init({"params": jax.random.PRNGKey(2)}, h, r, c)
    _, res = block.apply(params, h, r, c, True,
                         rngs={"drop_path": jax.random.PRNGKey(3)})
    res = np.asarray(res)
    kept = np.isclose(res, np.asarray(r + h / (1 - rate)), atol=1e-5)
    dropped = np.isclose(res, np.asarray(r), atol=1e-6)
    kept_samples = kept.all(axis=(1, 2))
    dropped_samples = dropped.all(axis=(1, 2))
    assert np.all(kept_samples | dropped_samples)
    frac = dropped_samples.mean()
    assert 0.25 < frac < 0.75  # 64 samples at p=0.5

    # eval mode: no rng needed, drop inactive
    _, res_eval = block.apply(params, h, r, c, False)
    np.testing.assert_allclose(np.asarray(res_eval), np.asarray(r + h),
                               atol=1e-6)


def test_block_first_position_never_dropped():
    """residual=None (first block / sub-blocks) must not drop even at p=1-eps
    -- reference applies drop_path only on the residual!=None branch."""
    block = _tiny_block(0.99)
    h = jnp.ones((8, 16, 32))
    c = jnp.zeros((8, 32))
    params = block.init({"params": jax.random.PRNGKey(0)}, h, None, c)
    _, res = block.apply(params, h, None, c, True,
                         rngs={"drop_path": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(res), np.asarray(h), atol=1e-6)


def test_decay_rule_matches_reference():
    cfg = DiMConfig(depth=4, drop_path=0.3)
    inter_dpr, dpr = DiM._drop_path_rates(cfg)
    np.testing.assert_allclose(dpr, [0.0, 0.1, 0.2, 0.3], atol=1e-9)
    np.testing.assert_allclose(inter_dpr[:4], [0.0, 0.0, 0.1, 0.2],
                               atol=1e-9)


def test_dim_zero_rate_bitwise_identical_and_positive_rate_runs():
    # depth 3: inter_dpr = [0, 0, p/2] -- depth 2 would give all-zero rates
    # (block i gets dpr[i-1]; the faithful decay rule)
    cfg0 = DiMConfig(img_resolution=8, patch_size=2, hidden_size=64, depth=3,
                     num_classes=10, rms_norm=True, block_type="combined",
                     cond_mamba=True, label_dropout=0.0)
    cfg1 = DiMConfig(**{**cfg0.__dict__, "drop_path": 0.8})
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4, 8, 8))
    t = jnp.full((16,), 0.5)
    y = jnp.zeros((16,), jnp.int32)
    m0, m1 = DiM(cfg0), DiM(cfg1)
    params = m0.init({"params": jax.random.PRNGKey(1)}, x, t, y)
    # adaLN-Zero init makes the fresh model output exactly 0; jitter every
    # leaf so output differences are observable
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [
        leaf + 0.02 * jax.random.normal(jax.random.PRNGKey(i), leaf.shape,
                                        leaf.dtype)
        for i, leaf in enumerate(leaves)
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    rngs = {"drop_path": jax.random.PRNGKey(2),
            "label_dropout": jax.random.PRNGKey(3)}

    out_eval = m0.apply(params, x, t, y)
    # p=0 + train=True is bitwise the eval path
    out0 = m0.apply(params, x, t, y, train=True, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out_eval))
    # p>0 + train=True actually perturbs the output (same params apply:
    # drop_path adds no parameters)
    out1 = m1.apply(params, x, t, y, train=True, rngs=rngs)
    assert not np.allclose(np.asarray(out1), np.asarray(out_eval))
    # p>0 at eval time is inert
    out1_eval = m1.apply(params, x, t, y)
    np.testing.assert_array_equal(np.asarray(out1_eval),
                                  np.asarray(out_eval))
