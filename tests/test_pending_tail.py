"""Cross-block pending-tail restructuring (DIMSUM_PENDING_TAIL, blocks.py /
dim.py): each combined block's tail FFN add (`total2 + gate_mlp * mlp_out`)
is deferred into the NEXT block's top add+norm instead of being materialized.
Mode 1 = XLA composition, mode 2 = the Pallas fused norm kernel at the
deferred top sites.  Both must match the materialized default exactly
(fp32: identical op order -> bitwise)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dimsum_tpu.models.dim import DiM, DiMConfig


def _cfg(**kw):
    base = dict(
        img_resolution=16, patch_size=2, in_channels=4, hidden_size=128,
        depth=4, num_classes=10, label_dropout=0.0, rms_norm=True,
        block_type="combined", cond_mamba=True,
        use_attn_every_k_layers=2, scan_impl="xla",
    )
    base.update(kw)
    return DiMConfig(**base)


def _data(cfg):
    kx, kt, kp = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (2, 4, cfg.img_resolution, cfg.img_resolution),
                          jnp.float32)
    t = jax.random.uniform(kt, (2,))
    y = jnp.array([1, 2], jnp.int32)
    return x, t, y, kp


@pytest.mark.parametrize("extra", [{}, {"is_moe": True}])
def test_pending_tail_xla_exact(monkeypatch, extra):
    cfg = _cfg(**extra)
    model = DiM(cfg)
    x, t, y, kp = _data(cfg)
    monkeypatch.setenv("DIMSUM_PENDING_TAIL", "0")
    params = model.init({"params": kp}, x, t, y)
    ref = model.apply(params, x, t, y)
    monkeypatch.setenv("DIMSUM_PENDING_TAIL", "1")
    out = model.apply(params, x, t, y)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_pending_tail_kernel_exact(monkeypatch):
    """Mode 2 drives the Pallas norm_modulate kernel (interpret mode on CPU)
    with branch+gate+residual at the deferred top sites."""
    cfg = _cfg()
    model = DiM(cfg)
    x, t, y, kp = _data(cfg)
    monkeypatch.setenv("DIMSUM_PENDING_TAIL", "0")
    params = model.init({"params": kp}, x, t, y)
    ref = model.apply(params, x, t, y)
    monkeypatch.setenv("DIMSUM_PENDING_TAIL", "2")
    monkeypatch.setenv("DIMSUM_NORM_INTERPRET", "1")
    out = model.apply(params, x, t, y)
    monkeypatch.setenv("DIMSUM_NORM_INTERPRET", "0")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=0, atol=1e-5)


def test_pending_tail_drop_path_exact(monkeypatch):
    """Stochastic depth materializes the deferred tail before masking; with
    the same drop_path rng the two paths are identical in training mode."""
    cfg = _cfg(drop_path=0.5)
    model = DiM(cfg)
    x, t, y, kp = _data(cfg)
    rngs = {"drop_path": jax.random.PRNGKey(7),
            "label_dropout": jax.random.PRNGKey(8)}
    monkeypatch.setenv("DIMSUM_PENDING_TAIL", "0")
    params = model.init({"params": kp}, x, t, y)
    ref = model.apply(params, x, t, y, train=True, rngs=rngs)
    monkeypatch.setenv("DIMSUM_PENDING_TAIL", "1")
    out = model.apply(params, x, t, y, train=True, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
