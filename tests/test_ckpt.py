"""Checkpoint converter + orbax save/restore tests.

The torch state dict below enumerates the EXACT parameter surface of a
reference DiM (depth-1 combined, cond_mamba, rms_norm, attention every
layer) -- the naming contract the converter must satisfy to load published
checkpoints."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dimsum_tpu.models.dim import DiM, DiMConfig
from dimsum_tpu.utils.ckpt import (
    convert_torch_state_dict, restore_checkpoint, save_checkpoint,
)


def make_reference_state_dict(rng):
    """Torch-layout arrays for DiM(depth=1, hidden=64, combined) as the
    reference's state_dict() would produce them."""
    D, half, d_inner, R, N, W = 64, 32, 64, 2, 16, 4
    L = (16 // 2) ** 2  # img 16, patch 2

    def rnd(*shape):
        # small scale: realistic-magnitude weights so the forward is finite
        return (0.02 * rng.standard_normal(shape)).astype(np.float32)

    sd = {
        "pos_embed": rnd(1, L, D),
        "x_embedder.proj.weight": rnd(D, 4, 2, 2),
        "x_embedder.proj.bias": rnd(D),
        "t_embedder.mlp.0.weight": rnd(D, 256),
        "t_embedder.mlp.0.bias": rnd(D),
        "t_embedder.mlp.2.weight": rnd(D, D),
        "t_embedder.mlp.2.bias": rnd(D),
        "y_embedder.embedding_table.weight": rnd(11, D),
        "final_layer.adaLN_modulation.1.weight": rnd(2 * D, D),
        "final_layer.adaLN_modulation.1.bias": rnd(2 * D),
        "final_layer.linear.weight": rnd(2 * 2 * 4, D),
        "final_layer.linear.bias": rnd(2 * 2 * 4),
    }
    for branch in ("spatial_mamba", "freq_mamba"):
        p = f"blocks.0.{branch}"
        sd.update({
            f"{p}.mixer.in_proj.weight": rnd(2 * d_inner, half),
            f"{p}.mixer.conv1d.weight": rnd(d_inner, 1, W),
            f"{p}.mixer.conv1d.bias": rnd(d_inner),
            f"{p}.mixer.x_proj.weight": rnd(R + 2 * N, d_inner),
            f"{p}.mixer.dt_proj.weight": rnd(d_inner, R),
            f"{p}.mixer.dt_proj.bias": rnd(d_inner),
            f"{p}.mixer.cond_proj.weight": rnd(d_inner, D),
            f"{p}.mixer.cond_proj.bias": rnd(d_inner),
            f"{p}.mixer.A_log": rnd(d_inner, N),
            f"{p}.mixer.D": rnd(d_inner),
            f"{p}.mixer.out_proj.weight": rnd(half, d_inner),
            f"{p}.adaLN_modulation.1.weight": rnd(3 * half, D),
            f"{p}.adaLN_modulation.1.bias": rnd(3 * half),
        })
    sd.update({
        "blocks.0.norm.weight": rnd(D),
        "blocks.0.norm_2.weight": rnd(D),
        "blocks.0.proj.qkv1.weight": rnd(3 * half, half),
        "blocks.0.proj.qkv1.bias": rnd(3 * half),
        "blocks.0.proj.qkv2.weight": rnd(3 * half, half),
        "blocks.0.proj.qkv2.bias": rnd(3 * half),
        "blocks.0.proj.proj.weight": rnd(D, D),
        "blocks.0.proj.proj.bias": rnd(D),
        "blocks.0.adaLN_modulation.1.weight": rnd(3 * D, D),
        "blocks.0.adaLN_modulation.1.bias": rnd(3 * D),
        "blocks.0.mlp.w12.weight": rnd(8 * D, D),
        "blocks.0.mlp.w12.bias": rnd(8 * D),
        "blocks.0.mlp.w3.weight": rnd(D, 4 * D),
        "blocks.0.mlp.w3.bias": rnd(D),
        "attn_block.attn.qkv.weight": rnd(3 * D, D),
        "attn_block.attn.qkv.bias": rnd(3 * D),
        "attn_block.attn.proj.weight": rnd(D, D),
        "attn_block.attn.proj.bias": rnd(D),
        "attn_block.adaLN_modulation.1.weight": rnd(6 * D, D),
        "attn_block.adaLN_modulation.1.bias": rnd(6 * D),
        "attn_block.mlp.w12.weight": rnd(8 * D, D),
        "attn_block.mlp.w12.bias": rnd(8 * D),
        "attn_block.mlp.w3.weight": rnd(D, 4 * D),
        "attn_block.mlp.w3.bias": rnd(D),
        # frozen DWT buffers in real checkpoints -- must be skipped
        "blocks.0.freq_mamba.dwt.w_ll": rnd(1, 1, 2, 2),
        "blocks.0.freq_mamba.idwt.filters": rnd(4, 1, 2, 2),
    })
    return sd


def tiny_cfg():
    return DiMConfig(img_resolution=16, patch_size=2, hidden_size=64,
                     depth=1, num_classes=10, rms_norm=True,
                     block_type="combined", cond_mamba=True,
                     learnable_pe=True, use_attn_every_k_layers=1,
                     scan_impl="xla")


def test_convert_reference_state_dict_strict():
    model = DiM(tiny_cfg())
    x = jnp.zeros((1, 4, 16, 16))
    template = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                          jnp.zeros((1,), jnp.int32))["params"]
    sd = make_reference_state_dict(np.random.default_rng(0))
    params = convert_torch_state_dict(sd, template, strict=True)
    # converted weights actually drive the model
    out = model.apply({"params": params}, x, jnp.full((1,), 0.5),
                      jnp.zeros((1,), jnp.int32))
    assert out.shape == (1, 4, 16, 16)
    assert np.isfinite(np.asarray(out)).all()
    # linear transpose applied: in_proj kernel is (in, out)
    k = params["blocks_0"]["spatial_mamba"]["mixer"]["in_proj"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(k),
        sd["blocks.0.spatial_mamba.mixer.in_proj.weight"].T)
    # patch-embed conv folded to matmul kernel
    pk = params["x_embedder"]["proj"]["kernel"]
    want = sd["x_embedder.proj.weight"].reshape(64, -1).T
    np.testing.assert_allclose(np.asarray(pk), want)


def test_convert_detects_shape_mismatch():
    model = DiM(tiny_cfg())
    x = jnp.zeros((1, 4, 16, 16))
    template = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                          jnp.zeros((1,), jnp.int32))["params"]
    sd = make_reference_state_dict(np.random.default_rng(0))
    sd["blocks.0.mlp.w3.weight"] = sd["blocks.0.mlp.w3.weight"][:, :8]
    with pytest.raises(ValueError, match="shape-mismatch"):
        convert_torch_state_dict(sd, template, strict=True)


def test_orbax_roundtrip(tmp_path):
    from dimsum_tpu.parallel import create_optimizer, create_train_state

    model = DiM(tiny_cfg())
    x = jnp.zeros((1, 4, 16, 16))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32))["params"]
    opt = create_optimizer()
    state = create_train_state(params, opt)
    save_checkpoint(str(tmp_path / "ckpt"), state, step=3)
    restored, step = restore_checkpoint(str(tmp_path / "ckpt"), state)
    assert step == 3
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # empty dir behaves
    none_state, none_step = restore_checkpoint(str(tmp_path / "nope"), state)
    assert none_state is None and none_step is None


def test_adapt_checkpoint_pos_embed_and_patch():
    from dimsum_tpu.utils.ckpt import adapt_checkpoint

    params = {
        "pos_embed": np.random.randn(1, 64, 16).astype(np.float32),
        "x_embedder": {"proj": {
            "kernel": np.random.randn(16, 32).astype(np.float32)}},
        "other": {"w": np.ones((4, 4), np.float32)},
    }
    template = {
        "pos_embed": np.zeros((1, 256, 16), np.float32),
        "x_embedder": {"proj": {"kernel": np.zeros((32, 32), np.float32)}},
        "other": {"w": np.zeros((4, 4), np.float32)},
    }
    out = adapt_checkpoint(params, template)
    assert out["pos_embed"].shape == (1, 256, 16)
    assert out["x_embedder"]["proj"]["kernel"].shape == (32, 32)
    # untouched param stays identical
    np.testing.assert_array_equal(np.asarray(out["other"]["w"]),
                                  params["other"]["w"])
    # incompatible non-adaptable mismatch raises
    bad_template = dict(template)
    bad_template["other"] = {"w": np.zeros((8, 8), np.float32)}
    with pytest.raises(ValueError, match="cannot adapt"):
        adapt_checkpoint(params, bad_template)


def test_warmup_cosine_schedule():
    from dimsum_tpu.parallel.train import warmup_cosine_schedule

    sched = warmup_cosine_schedule(1e-4, 1e-6, warmup_epochs=2,
                                   total_epochs=10, steps_per_epoch=100)
    assert float(sched(0)) < 1e-6 + 1e-9
    np.testing.assert_allclose(float(sched(200)), 1e-4, rtol=1e-2)
    assert float(sched(1000)) <= 1.2e-6


def test_convert_dit_state_dict():
    """DiT checkpoints (timm Mlp fc1/fc2, attention qkv/proj) convert too."""
    from dimsum_tpu.models.dit import DiT, DiTConfig

    D, heads = 64, 4
    cfg = DiTConfig(img_resolution=16, patch_size=2, hidden_size=D,
                    depth=1, num_heads=heads, num_classes=10)
    model = DiT(cfg)
    x = jnp.zeros((1, 4, 16, 16))
    template = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                          jnp.zeros((1,), jnp.int32))["params"]
    rng = np.random.default_rng(0)

    def rnd(*s):
        return (0.02 * rng.standard_normal(s)).astype(np.float32)

    L = 64
    sd = {
        "pos_embed": rnd(1, L, D),
        "x_embedder.proj.weight": rnd(D, 4, 2, 2),
        "x_embedder.proj.bias": rnd(D),
        "t_embedder.mlp.0.weight": rnd(D, 256),
        "t_embedder.mlp.0.bias": rnd(D),
        "t_embedder.mlp.2.weight": rnd(D, D),
        "t_embedder.mlp.2.bias": rnd(D),
        "y_embedder.embedding_table.weight": rnd(11, D),
        "blocks.0.attn.qkv.weight": rnd(3 * D, D),
        "blocks.0.attn.qkv.bias": rnd(3 * D),
        "blocks.0.attn.proj.weight": rnd(D, D),
        "blocks.0.attn.proj.bias": rnd(D),
        "blocks.0.adaLN_modulation.1.weight": rnd(6 * D, D),
        "blocks.0.adaLN_modulation.1.bias": rnd(6 * D),
        "blocks.0.mlp.fc1.weight": rnd(4 * D, D),
        "blocks.0.mlp.fc1.bias": rnd(4 * D),
        "blocks.0.mlp.fc2.weight": rnd(D, 4 * D),
        "blocks.0.mlp.fc2.bias": rnd(D),
        "final_layer.adaLN_modulation.1.weight": rnd(2 * D, D),
        "final_layer.adaLN_modulation.1.bias": rnd(2 * D),
        "final_layer.linear.weight": rnd(2 * 2 * 4, D),
        "final_layer.linear.bias": rnd(2 * 2 * 4),
    }
    params = convert_torch_state_dict(sd, template, strict=True)
    out = model.apply({"params": params}, x, jnp.full((1,), 0.5),
                      jnp.zeros((1,), jnp.int32))
    assert np.isfinite(np.asarray(out)).all()


def test_orbax_roundtrip_sharded(tmp_path):
    """Checkpointing must survive mesh-sharded arrays (multi-chip train
    states): save sharded, restore into the same sharded template."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dimsum_tpu.parallel import (
        create_optimizer, create_train_state, make_mesh,
    )

    mesh = make_mesh(data=8, model=1)
    model = DiM(tiny_cfg())
    x = jnp.zeros((1, 4, 16, 16))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32))["params"]
    params = jax.device_put(params, NamedSharding(mesh, P()))
    state = create_train_state(params, create_optimizer())
    save_checkpoint(str(tmp_path / "ck"), state, step=1)
    restored, step = restore_checkpoint(str(tmp_path / "ck"), state)
    assert step == 1
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
