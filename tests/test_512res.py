"""512-resolution lane (VERDICT r2 weak #6): the CelebA/ImageNet-512
configuration -- image_size 512 -> latent 64 -> patch 2 -> 32x32 token grid,
L=1024.  Reference anchor: /root/reference/scripts/train.sh:60-83 (CelebA-512
block) and README.md:144-149.

These run on CPU at reduced width; the TPU throughput quote lives in
BENCH.md ("512-resolution" section)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dimsum_tpu.models.dim import DiM, DiMConfig


def _cfg512(**kw):
    base = dict(img_resolution=64, patch_size=2, in_channels=4,
                hidden_size=128, depth=4, num_classes=10, rms_norm=True,
                block_type="combined", cond_mamba=True, learnable_pe=True,
                use_attn_every_k_layers=4)
    base.update(kw)
    return DiMConfig(**base)


def test_512res_grid32_forward_shapes():
    """image-size 512 config: 32x32 grid (L=1024), forward preserves the
    latent shape; the wave branch's 2-level pack and the window scan must
    both divide cleanly at this grid."""
    cfg = _cfg512()
    model = DiM(cfg)
    x = jnp.ones((2, 4, 64, 64), jnp.float32)
    t = jnp.full((2,), 0.3)
    y = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    # grid check: the (frozen or learnable) pos embed covers 1024 tokens
    pe = params["params"]["pos_embed"]
    assert pe.shape[-2] == 1024  # 32 * 32
    out = jax.jit(model.apply)(params, x, t, y)
    assert out.shape == (2, 4, 64, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_512res_train_step_decreases_loss():
    """One-step train smoke at the 512-res grid: velocity-MSE loss is finite
    and a gradient step moves it (the TPU-scale smoke is the BENCH.md 512
    section; this guards the config path on CPU)."""
    import optax

    from dimsum_tpu.transport import create_transport

    cfg = _cfg512(depth=2, use_attn_every_k_layers=-1)
    model = DiM(cfg)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 64, 64))
    y = jnp.asarray([1, 3], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x1, jnp.zeros((2,)), y)
    transport = create_transport("GVP", "velocity")

    def loss_fn(p, key):
        terms = transport.training_losses(
            lambda xt, t, **kw: model.apply(
                p, xt, t, kw.get("y"),
                rngs={"label_dropout": jax.random.PRNGKey(7)}),
            key, x1, model_kwargs={"y": y})
        return jnp.mean(terms["loss"])

    opt = optax.adam(1e-3)
    state = opt.init(params)
    key = jax.random.PRNGKey(2)

    @jax.jit
    def step(p, s, k):
        l, g = jax.value_and_grad(loss_fn)(p, k)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, l

    p1, state, l0 = step(params, state, key)
    _, _, l1 = step(p1, state, key)  # same batch/key: loss must drop
    assert np.isfinite(float(l0)) and float(l1) < float(l0)


def test_512res_warm_start_interpolates_pos_embed():
    """Reference warm-start path (train.py:205-236 / models_dim.py:99-121):
    a 256-res checkpoint adapts to the 512-res grid by bicubic pos-embed
    interpolation; patch-embed and final-layer widths carry over."""
    from dimsum_tpu.utils.ckpt import adapt_checkpoint

    cfg256 = _cfg512(img_resolution=32)
    cfg512 = _cfg512()
    m256, m512 = DiM(cfg256), DiM(cfg512)
    x256 = jnp.ones((1, 4, 32, 32))
    t = jnp.zeros((1,))
    y = jnp.zeros((1,), jnp.int32)
    p256 = m256.init(jax.random.PRNGKey(0), x256, t, y)
    target = jax.eval_shape(
        m512.init, jax.random.PRNGKey(0), jnp.ones((1, 4, 64, 64)), t, y)
    adapted = adapt_checkpoint(p256, target)
    assert adapted["params"]["pos_embed"].shape[-2] == 1024
    out = m512.apply(adapted, jnp.ones((1, 4, 64, 64)), t, y)
    assert out.shape == (1, 4, 64, 64)
    assert np.isfinite(np.asarray(out)).all()
