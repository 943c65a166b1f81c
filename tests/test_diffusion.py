"""ADM Gaussian diffusion tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dimsum_tpu.diffusion.gaussian_diffusion import (
    GaussianDiffusion, LossSecondMomentResampler, LossType, ModelMeanType,
    ModelVarType, UniformSampler, get_named_beta_schedule, space_timesteps,
    spaced_diffusion,
)


def test_beta_schedules():
    for name in ("linear", "cosine"):
        betas = get_named_beta_schedule(name, 100)
        assert betas.shape == (100,)
        assert (betas > 0).all() and (betas < 1).all()


def test_q_sample_endpoints():
    gd = GaussianDiffusion(betas=get_named_beta_schedule("linear", 1000))
    x = jnp.ones((2, 3, 4, 4))
    noise = jnp.zeros_like(x)
    # t=0: nearly x_start
    x0 = gd.q_sample(x, jnp.zeros((2,), jnp.int32), noise)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x), rtol=1e-3)
    # t=T-1 with alphas_cumprod tiny: mostly noise scale
    assert gd.alphas_cumprod[-1] < 0.01


def test_eps_xstart_roundtrip():
    gd = GaussianDiffusion(betas=get_named_beta_schedule("linear", 100))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 3, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((2, 3, 4, 4)), jnp.float32)
    t = jnp.array([10, 50])
    xt = gd.q_sample(x0, t, eps)
    x0_hat = gd._predict_xstart_from_eps(xt, t, eps)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0),
                               rtol=1e-3, atol=1e-3)
    eps_hat = gd._predict_eps_from_xstart(xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(eps),
                               rtol=1e-3, atol=1e-3)


def test_training_losses_zero_for_perfect_eps_model():
    gd = GaussianDiffusion(betas=get_named_beta_schedule("linear", 100))
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 4, 4))
    t = jnp.array([3, 20, 50, 90])

    captured = {}
    orig_q = gd.q_sample

    def capturing_q(x_start, t_, noise):
        captured["noise"] = noise
        return orig_q(x_start, t_, noise)

    gd.q_sample = capturing_q
    model = lambda x, tt, **kw: captured["noise"]
    terms = gd.training_losses(model, x0, t, rng)
    np.testing.assert_allclose(np.asarray(terms["loss"]), 0.0, atol=1e-12)


def test_p_sample_loop_runs():
    gd = GaussianDiffusion(betas=get_named_beta_schedule("cosine", 8))
    model = lambda x, t, **kw: jnp.zeros_like(x)
    out = gd.p_sample_loop(model, (2, 3, 4, 4), jax.random.PRNGKey(0))
    assert out.shape == (2, 3, 4, 4)
    assert np.isfinite(np.asarray(out)).all()
    out2 = gd.ddim_sample_loop(model, (2, 3, 4, 4), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out2)).all()


def test_learned_range_variance_split():
    gd = GaussianDiffusion(betas=get_named_beta_schedule("linear", 10),
                           model_var_type=ModelVarType.LEARNED_RANGE)
    model = lambda x, t, **kw: jnp.concatenate(
        [jnp.zeros_like(x), jnp.zeros_like(x)], axis=1)
    out = gd.p_mean_variance(model, jnp.ones((1, 3, 4, 4)),
                             jnp.array([5]))
    assert out["mean"].shape == (1, 3, 4, 4)
    assert np.isfinite(np.asarray(out["log_variance"])).all()


def test_respacing():
    assert space_timesteps(100, "ddim10") == list(range(0, 100, 10))
    taken = space_timesteps(100, "10")
    assert len(taken) == 10
    base = get_named_beta_schedule("linear", 100)
    gd = spaced_diffusion(base, space_timesteps(100, "10"))
    assert gd.num_timesteps == 10
    # respaced cumprod matches base at the kept steps
    kept = sorted(space_timesteps(100, "10"))
    base_cum = np.cumprod(1 - base)
    np.testing.assert_allclose(gd.alphas_cumprod, base_cum[kept], rtol=1e-10)


def test_timestep_samplers():
    gd = GaussianDiffusion(betas=get_named_beta_schedule("linear", 50))
    t, w = UniformSampler(gd).sample(jax.random.PRNGKey(0), 16)
    assert t.shape == (16,) and (np.asarray(w) == 1).all()
    rs = LossSecondMomentResampler(gd, history=2)
    # before warm-up: uniform
    t, w = rs.sample(jax.random.PRNGKey(1), 8)
    np.testing.assert_allclose(np.asarray(w), 1.0, rtol=1e-5)
    # warm up and check weights renormalize
    for _ in range(2):
        rs.update(np.arange(50), np.linspace(0.1, 5.0, 50))
    w = rs.weights()
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-8)
    assert w[-1] > w[0]  # higher loss -> higher weight
