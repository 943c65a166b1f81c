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
