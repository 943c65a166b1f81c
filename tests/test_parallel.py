"""Sharded training tests on the virtual 8-device CPU mesh.

Exactness contract (VERDICT r1 item 3):
  * shard_map DP step == a single-device step that processes the same
    shards with the same injected per-shard keys (grad mean, clip, AdamW,
    EMA all identical);
  * GSPMD TP placement (params sharded over 'model' by tp_param_specs) ==
    GSPMD DP placement (batch sharded over 'data') == unsharded single
    device -- same jitted step, same rng, only input shardings differ;
  * MoE expert parallelism (capacity dispatch + sharding constraints) ==
    the reference-parity dense expert loop, given capacity >= busiest
    expert load.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dimsum_tpu.models.dim import DiM, DiMConfig
from dimsum_tpu.parallel import (
    TrainState, create_optimizer, create_train_state, make_mesh,
    make_sample_step, make_train_step, tp_param_specs, tp_shardings,
)
from dimsum_tpu.parallel.train import (
    clip_by_global_norm, ema_update,
)
from dimsum_tpu.transport import Sampler, create_transport


def tiny_model(**kw):
    cfg = DiMConfig(img_resolution=8, patch_size=2, in_channels=4,
                    hidden_size=32, depth=2, num_classes=10, rms_norm=True,
                    block_type="combined", cond_mamba=True,
                    use_attn_every_k_layers=2, learnable_pe=True,
                    scan_impl="xla", **kw)
    return DiM(cfg), cfg


def test_mesh_and_train_step_8dev():
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=8, model=1)
    model, cfg = tiny_model()
    transport = create_transport("GVP", "velocity")

    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4, 8, 8))
    y = jnp.arange(16) % 10
    params = model.init(jax.random.PRNGKey(1), x[:1], jnp.zeros((1,)),
                        y[:1])["params"]
    opt = create_optimizer(1e-4)
    state = create_train_state(params, opt)
    # keep host copies: the step donates its input state buffers
    ref_params = jax.tree.map(np.asarray, state.params)
    ref_ema = jax.tree.map(np.asarray, state.ema_params)
    step = make_train_step(model, transport, opt, mesh=mesh)
    keys = jax.random.split(jax.random.PRNGKey(2), 8)
    state2, metrics = step(state, x, y, keys)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # params actually moved
    delta = jax.tree.map(lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()),
                         ref_params, state2.params)
    assert max(jax.tree.leaves(delta)) > 0

    # EMA moved a tiny bit toward params
    d_ema = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()),
        ref_ema, state2.ema_params)))
    assert 0 < d_ema < 1e-2


def _single_device_oracle(model, transport, opt, params, x, y, keys,
                          max_grad_norm=1.0, ema_decay=0.9999):
    """Sequentially replays the shard_map DP step on one device: per-shard
    loss/grads with that shard's injected key, mean across shards (the
    psum), then the identical clip/AdamW/EMA tail."""
    n = keys.shape[0]
    per = x.shape[0] // n

    def shard_loss(p, xs, ys, key):
        kt, kd, kp = jax.random.split(key, 3)

        def model_fn(xt, t, **kw):
            return model.apply({"params": p}, xt, t, train=True,
                               rngs={"label_dropout": kd, "drop_path": kp},
                               **kw)

        return transport.training_losses(model_fn, kt, xs,
                                         {"y": ys})["loss"].mean()

    @jax.jit
    def run(params):
        losses, grads = [], []
        for i in range(n):
            sl = slice(i * per, (i + 1) * per)
            li, gi = jax.value_and_grad(shard_loss)(params, x[sl], y[sl],
                                                    keys[i])
            losses.append(li)
            grads.append(gi)
        loss = sum(losses) / n
        grad = jax.tree.map(lambda *g: sum(g) / n, *grads)
        grad, grad_norm = clip_by_global_norm(grad, max_grad_norm)
        opt_state = opt.init(params)
        updates, opt_state = opt.update(grad, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        ema = ema_update(jax.tree.map(jnp.copy, params), new_params,
                         ema_decay)
        return loss, new_params, ema

    return run(params)


def test_dp_matches_single_device_gradients():
    """shard_map DP step == single-device replay with the same per-shard
    keys: loss AND updated params AND ema, exactly (fp32 reassociation
    tolerance)."""
    model, cfg = tiny_model()
    transport = create_transport("GVP", "velocity")
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 8, 8))
    y = jnp.arange(8) % 10
    params = model.init(jax.random.PRNGKey(1), x[:1], jnp.zeros((1,)),
                        y[:1])["params"]
    opt = create_optimizer(1e-2)
    keys = jax.random.split(jax.random.PRNGKey(2), 8)

    mesh = make_mesh(data=8, model=1)
    step_dp = make_train_step(model, transport, opt, mesh=mesh)
    s_dp, m_dp = step_dp(create_train_state(params, opt), x, y, keys)

    loss_ref, params_ref, ema_ref = _single_device_oracle(
        model, transport, opt, params, x, y, keys)

    np.testing.assert_allclose(float(m_dp["loss"]), float(loss_ref),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_dp.params),
                    jax.tree.leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_dp.ema_params),
                    jax.tree.leaves(ema_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=1e-5)


def test_grad_accum_matches_sequential_replay():
    """grad_accum=N step == the sequential-replay oracle over the N
    microbatches with the microbatch keys jax.random.split(step_key, N):
    loss, params and EMA exactly (the DP-oracle pattern applied along the
    accumulation axis instead of the data axis)."""
    model, cfg = tiny_model()
    transport = create_transport("GVP", "velocity")
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 8, 8))
    y = jnp.arange(8) % 10
    params = model.init(jax.random.PRNGKey(1), x[:1], jnp.zeros((1,)),
                        y[:1])["params"]
    opt = create_optimizer(1e-2)
    rng = jax.random.PRNGKey(2)

    step = make_train_step(model, transport, opt, mesh=None, grad_accum=4)
    s_acc, m_acc = step(create_train_state(params, opt), x, y, rng)

    keys = jax.random.split(rng, 4)
    loss_ref, params_ref, ema_ref = _single_device_oracle(
        model, transport, opt, params, x, y, keys)

    np.testing.assert_allclose(float(m_acc["loss"]), float(loss_ref),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_acc.params),
                    jax.tree.leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_acc.ema_params),
                    jax.tree.leaves(ema_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=1e-5)


def test_ema_decay_flag_semantics():
    """make_train_step(ema_decay=d) applies exactly
    ema' = d*ema + (1-d)*params' (train.py --ema-decay plumbs here):
    d=0 makes the EMA track raw params bitwise; d=0.5 matches the closed
    form against a copy of the pre-step EMA tree."""
    model, cfg = tiny_model()
    transport = create_transport("GVP", "velocity")
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 8, 8))
    y = jnp.arange(4) % 10
    params = model.init(jax.random.PRNGKey(1), x[:1], jnp.zeros((1,)),
                        y[:1])["params"]
    opt = create_optimizer(1e-2)
    rng = jax.random.PRNGKey(2)

    step0 = make_train_step(model, transport, opt, mesh=None, ema_decay=0.0)
    s0, _ = step0(create_train_state(params, opt), x, y, rng)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s0.ema_params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    ema_before = jax.tree.map(np.asarray, params)  # ema starts as a copy
    step5 = make_train_step(model, transport, opt, mesh=None, ema_decay=0.5)
    s5, _ = step5(create_train_state(params, opt), x, y, rng)
    expect = jax.tree.map(lambda e, p: 0.5 * e + 0.5 * np.asarray(p),
                          ema_before, s5.params)
    for a, b in zip(jax.tree.leaves(s5.ema_params), jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-7, rtol=1e-6)


def test_dp_grad_accum_composes():
    """shard_map DP x grad_accum (the flagship global-704 recipe shape:
    scripts/train.sh runs --grad-accum 8 on an 8-chip data mesh) == the
    sequential-replay oracle over all (shard, microbatch) slices: shard i's
    injected key splits into grad_accum microbatch keys, per-shard grads
    average over microbatches, the psum averages over shards -- the flat
    replay over all dp*accum slices with the composed keys is identical."""
    model, cfg = tiny_model()
    transport = create_transport("GVP", "velocity")
    dp, accum = 8, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4, 8, 8))
    y = jnp.arange(16) % 10
    params = model.init(jax.random.PRNGKey(1), x[:1], jnp.zeros((1,)),
                        y[:1])["params"]
    opt = create_optimizer(1e-2)
    keys = jax.random.split(jax.random.PRNGKey(2), dp)

    mesh = make_mesh(data=dp, model=1)
    step = make_train_step(model, transport, opt, mesh=mesh,
                           grad_accum=accum)
    s_c, m_c = step(create_train_state(params, opt), x, y, keys)

    # flat replay: shard-major then microbatch order matches the data
    # layout (shard i holds x[i*per:(i+1)*per], reshaped (accum, mb))
    micro_keys = jnp.concatenate(
        [jax.random.split(keys[i], accum) for i in range(dp)])
    loss_ref, params_ref, ema_ref = _single_device_oracle(
        model, transport, opt, params, x, y, micro_keys)

    np.testing.assert_allclose(float(m_c["loss"]), float(loss_ref),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_c.params),
                    jax.tree.leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_c.ema_params),
                    jax.tree.leaves(ema_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=1e-5)


def test_gspmd_tp_matches_dp_and_single_device():
    """The GSPMD step gives identical results under three placements:
    unsharded, batch-sharded over 'data', params-sharded over 'model'
    (tp_param_specs).  Same step fn, same rng; only shardings differ."""
    model, cfg = tiny_model()
    transport = create_transport("GVP", "velocity")
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 8, 8))
    y = jnp.arange(8) % 10
    params = model.init(jax.random.PRNGKey(1), x[:1], jnp.zeros((1,)),
                        y[:1])["params"]
    opt = create_optimizer(1e-2)
    rng = jax.random.PRNGKey(2)
    step = make_train_step(model, transport, opt, mesh=None)

    # (a) unsharded single device
    s_a, m_a = step(create_train_state(params, opt), x, y, rng)
    loss_a = float(m_a["loss"])

    # (b) GSPMD dp: batch over 'data'
    mesh_dp = make_mesh(data=8, model=1)
    x_b = jax.device_put(x, NamedSharding(mesh_dp, P("data")))
    y_b = jax.device_put(y, NamedSharding(mesh_dp, P("data")))
    p_b = jax.device_put(params, NamedSharding(mesh_dp, P()))
    s_b, m_b = step(create_train_state(p_b, opt), x_b, y_b, rng)

    # (c) GSPMD tp: params over 'model'
    mesh_tp = make_mesh(data=1, model=8)
    p_c = jax.device_put(params, tp_shardings(mesh_tp, params))
    s_c, m_c = step(create_train_state(p_c, opt), x, y, rng)

    np.testing.assert_allclose(float(m_b["loss"]), loss_a, rtol=1e-5)
    np.testing.assert_allclose(float(m_c["loss"]), loss_a, rtol=1e-5)
    for sx, name in ((s_b, "dp"), (s_c, "tp")):
        for a, b in zip(jax.tree.leaves(sx.params),
                        jax.tree.leaves(s_a.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-6, rtol=1e-4,
                err_msg=f"{name} placement diverged from single device")


def test_moe_ep_matches_dense_expert_loop():
    """SwitchMLP EP (capacity dispatch, stacked weights) == the dense
    reference-parity expert loop, weights converted via
    stack_expert_params.  Sharded placement == unsharded EP."""
    from dimsum_tpu.models.blocks import SwitchMLP
    from dimsum_tpu.parallel.moe_ep import stack_expert_params

    D, E = 32, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, D))
    dense = SwitchMLP(dim=D, num_moe_experts=E)
    dense_params = dense.init(jax.random.PRNGKey(1), x)["params"]
    want = dense.apply({"params": dense_params}, x)

    stacked = stack_expert_params(dense_params)
    ep_unsharded = SwitchMLP(dim=D, num_moe_experts=E, ep_axis="model",
                             ep_mesh=None, capacity_factor=float(E))
    ep_params = {"router": dense_params["router"],
                 "experts_fc1_kernel": stacked["w1"],
                 "experts_fc2_kernel": stacked["w2"]}
    got = ep_unsharded.apply({"params": ep_params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    mesh = make_mesh(data=1, model=8)
    ep_sharded = SwitchMLP(dim=D, num_moe_experts=E, ep_axis="model",
                           ep_mesh=mesh, capacity_factor=float(E))
    p_sh = jax.device_put(
        ep_params,
        {"router": NamedSharding(mesh, P()),
         "experts_fc1_kernel": NamedSharding(mesh, P("model")),
         "experts_fc2_kernel": NamedSharding(mesh, P("model"))})
    got_sh = jax.jit(
        lambda p, v: ep_sharded.apply({"params": p}, v))(p_sh, x)
    np.testing.assert_allclose(np.asarray(got_sh), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_dim_moe_ep_forward():
    """DiM with is_moe + moe_ep_axis runs sharded and matches the dense-MoE
    DiM given converted expert weights."""
    from dimsum_tpu.parallel.moe_ep import stack_expert_params

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    t = jnp.full((2,), 0.4)
    y = jnp.arange(2) % 10

    model_dense, _ = tiny_model(is_moe=True)
    params = model_dense.init(jax.random.PRNGKey(1), x, t, y)["params"]
    want = model_dense.apply({"params": params}, x, t, y)

    mesh = make_mesh(data=1, model=8)
    model_ep, _ = tiny_model(is_moe=True, moe_ep_axis="model",
                             moe_ep_mesh=mesh, moe_capacity_factor=8.0)

    # convert the dense MoE block params (blocks_1 is the MoE layer) into
    # the stacked EP layout
    params_ep = dict(params)
    mixer = dict(params["blocks_1"]["mixer"])
    stacked = stack_expert_params(mixer)
    new_mixer = {"router": mixer["router"],
                 "experts_fc1_kernel": stacked["w1"],
                 "experts_fc2_kernel": stacked["w2"]}
    params_ep["blocks_1"] = dict(params["blocks_1"])
    params_ep["blocks_1"]["mixer"] = new_mixer

    got = jax.jit(
        lambda p, *a: model_ep.apply({"params": p}, *a))(params_ep, x, t, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_sample_step_sharded():
    model, cfg = tiny_model()
    transport = create_transport("GVP", "velocity")
    sampler = Sampler(transport)
    sample_fn = sampler.sample_ode(sampling_method="euler", num_steps=4)
    mesh = make_mesh(data=8, model=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 8, 8))
    y = jnp.arange(8) % 10
    params = model.init(jax.random.PRNGKey(1), x[:1], jnp.zeros((1,)),
                        y[:1])["params"]

    def fn(z, model_fn, rng=None, **kw):
        return sample_fn(z, model_fn, **kw)

    step = make_sample_step(model, fn, mesh=mesh)
    out = step(params, x, y, jax.random.PRNGKey(3))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_tp_param_specs_cover_big_matmuls():
    model, cfg = tiny_model()
    x = jnp.zeros((1, 4, 8, 8))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32))["params"]
    specs = tp_param_specs(params)
    flat = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda x: hasattr(x, "index") or x is None)[0]
    named = {"/".join(str(getattr(k, 'key', k)) for k, in
             [(p,) for p in path]): spec for path, spec in flat}
    sharded = [k for k, v in named.items()
               if any(ax == "model" for ax in v)]
    assert any("in_proj" in k for k in sharded)
    assert any("w12" in k for k in sharded)
    assert any("out_proj" in k for k in sharded)
