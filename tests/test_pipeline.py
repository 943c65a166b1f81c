"""Pipeline parallelism: GPipe schedule must equal sequential stage apply."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dimsum_tpu.parallel.pipeline import pipeline_apply


def test_pipeline_matches_sequential():
    devices = jax.devices()
    K = len(devices)
    mesh = Mesh(np.array(devices), axis_names=("stage",))
    D = 16
    layers_per_stage = 2
    n_layers = K * layers_per_stage
    rng = np.random.default_rng(0)
    # stacked per-layer weights: (n_layers, D, D), sharded over stages
    W = jnp.asarray(
        (0.1 * rng.standard_normal((n_layers, D, D))).astype(np.float32))
    b = jnp.asarray(
        (0.1 * rng.standard_normal((n_layers, D))).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((8, 4, D)).astype(np.float32))

    def layer(w, bb, v):
        return jnp.tanh(v @ w + bb)

    # sequential oracle
    want = x
    for i in range(n_layers):
        want = layer(W[i], b[i], want)

    def stage_fn(params, v):
        ws, bs = params
        for i in range(layers_per_stage):
            v = layer(ws[i], bs[i], v)
        return v

    pp = shard_map(
        lambda params, xx: pipeline_apply(stage_fn, params, xx,
                                          axis_name="stage",
                                          num_microbatches=4),
        mesh=mesh,
        in_specs=((P("stage"), P("stage")), P()),
        out_specs=P(),
        check_vma=False,
    )
    got = jax.jit(pp)((W, b), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_pytree_activations():
    """Activations may be a pytree (e.g. (hidden, residual) pairs)."""
    devices = jax.devices()
    K = len(devices)
    mesh = Mesh(np.array(devices), axis_names=("stage",))
    D = 8
    W = jnp.eye(D) * 0.5

    def stage_fn(w, tree):
        h, r = tree
        return (h @ w + r, r)

    x = (jnp.ones((4, D)), jnp.ones((4, D)) * 2.0)
    want = x
    for _ in range(K):
        want = stage_fn(W, want)

    pp = shard_map(
        lambda w, xx: pipeline_apply(stage_fn, w, xx, axis_name="stage",
                                     num_microbatches=2),
        mesh=mesh,
        in_specs=(P(), (P(), P())),
        out_specs=(P(), P()),
        check_vma=False,
    )
    got = jax.jit(pp)(W, x)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=1e-5, atol=1e-5)


def test_pipeline_dim_mixer_blocks():
    """REAL DiM blocks under GPipe: a homogeneous MixerBlockCore stack
    (hidden, fp32 residual, adaLN conditioning) partitioned over 4 stages
    must equal the sequential backbone exactly."""
    import pytest

    from dimsum_tpu.models.blocks import MixerBlockCore

    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs >= 4 devices")
    K = 4
    mesh = Mesh(np.array(devices[:K]), axis_names=("stage",))
    D, L, B = 32, 16, 4
    per_stage = 2
    n_blocks = K * per_stage

    block = MixerBlockCore(dim=D, mixer_kwargs={"d_state": 8},
                           rms_norm=True, no_ffn=True, c_dim=D)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    keys = jax.random.split(jax.random.PRNGKey(0), n_blocks)
    plist = [block.init(k, x, None, c) for k in keys]
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *plist)

    # sequential oracle (residual=zeros == the None first-block case)
    h, res = x, jnp.zeros_like(x)
    for p in plist:
        h, res = block.apply(p, h, res, c)
    want = h

    def stage_fn(stage_params, mb):
        h, res, c_ = mb
        for i in range(per_stage):
            p_i = jax.tree.map(lambda a: a[i], stage_params)
            h, res = block.apply(p_i, h, res, c_)
        return (h, res, c_)

    pp = shard_map(
        lambda params, xx: pipeline_apply(stage_fn, params, xx,
                                          axis_name="stage",
                                          num_microbatches=2),
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("stage"), stacked),
                  (P(), P(), P())),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    got_h, _, _ = jax.jit(pp)(stacked, (x, jnp.zeros_like(x), c))
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_dim_full_model_pipeline_matches_sequential():
    """dim_pipeline_forward (embed replicated, 8 combined blocks staged 2x4
    over 'stage' with shared attention every 4) == DiM.apply exactly."""
    import numpy as np
    from jax.sharding import Mesh

    from dimsum_tpu.models.dim import DiM, DiMConfig
    from dimsum_tpu.parallel.pipeline import dim_pipeline_forward

    cfg = DiMConfig(img_resolution=16, patch_size=2, in_channels=4,
                    hidden_size=32, depth=8, num_classes=10, rms_norm=True,
                    block_type="combined", cond_mamba=True,
                    learnable_pe=True, use_attn_every_k_layers=4,
                    scan_impl="xla")
    model = DiM(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 16, 16))
    t = jnp.linspace(0.1, 0.9, 8)
    y = jnp.arange(8, dtype=jnp.int32) % 10
    params = model.init(jax.random.PRNGKey(1), x, t, y)["params"]
    want = model.apply({"params": params}, x, t, y)

    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("stage",))
    got = jax.jit(lambda p, *a: dim_pipeline_forward(
        cfg, p, *a, mesh=mesh, num_microbatches=4))(params, x, t, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
