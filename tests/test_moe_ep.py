"""Expert-parallel MoE: exact parity with the single-device dispatch on an
8-device mesh (capacity high enough for no drops), and drop behavior."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dimsum_tpu.parallel.moe_ep import init_expert_params, switch_ep_apply


def test_single_device_matches_reference_dense_semantics():
    """Capacity-dispatched single-device MoE == per-token expert apply
    (the reference SwitchMLP semantics) when nothing is dropped."""
    key = jax.random.PRNGKey(0)
    D, H, E = 16, 32, 8
    params = init_expert_params(key, E, D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, D))
    out = switch_ep_apply(params, x, axis_name=None, capacity_factor=E)

    # oracle: route each token through its own argmax expert
    xf = np.asarray(x).reshape(-1, D)
    route = jax.nn.softmax(xf @ np.asarray(params["router"]), axis=-1)
    want = np.zeros_like(xf)
    for t in range(xf.shape[0]):
        e = int(np.argmax(route[t]))
        h = xf[t] @ np.asarray(params["w1"][e])
        a, b = np.split(h, 2)
        h = np.asarray(jax.nn.gelu(jnp.asarray(a), approximate=False)) * b
        want[t] = (h @ np.asarray(params["w2"][e])) * route[t].max()
    np.testing.assert_allclose(np.asarray(out).reshape(-1, D), want,
                               rtol=2e-4, atol=2e-4)


def test_expert_parallel_matches_local():
    devices = jax.devices()
    mesh = Mesh(np.array(devices), axis_names=("model",))
    K = len(devices)
    D, H, E = 16, 32, 2 * K
    params = init_expert_params(jax.random.PRNGKey(0), E, D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, D))

    want = switch_ep_apply(params, x, axis_name=None, capacity_factor=E)

    ep = shard_map(
        lambda p, xx: switch_ep_apply(p, xx, axis_name="model",
                                      capacity_factor=E),
        mesh=mesh,
        in_specs=({"router": P(), "w1": P("model"), "w2": P("model")},
                  P()),
        out_specs=P(),
        check_vma=False,
    )
    got = jax.jit(ep)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_capacity_drops_overflow_tokens():
    """With capacity 1 per expert, overflowing tokens contribute zero
    (they ride the residual in the surrounding block)."""
    D, H, E = 8, 16, 2
    params = init_expert_params(jax.random.PRNGKey(0), E, D, H)
    # force all tokens to expert 0 via a biased router
    params = dict(params)
    params["router"] = jnp.zeros((D, E)).at[:, 0].set(10.0)
    x = jnp.ones((1, 6, D))
    out = switch_ep_apply(params, x, axis_name=None, capacity_factor=0.34)
    o = np.asarray(out)[0]
    # capacity = ceil(6 * 0.34 / 2) = 2: first 2 tokens processed, rest 0
    assert np.abs(o[0]).sum() > 0 and np.abs(o[1]).sum() > 0
    np.testing.assert_allclose(o[2:], 0.0, atol=0)
