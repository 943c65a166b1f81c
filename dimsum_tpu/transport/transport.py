"""Transport (flow-matching) losses and samplers.

Reference: `/root/reference/dimsum/transport/transport.py` (Transport :41-218,
Sampler :221-445).  Fully functional: explicit RNG keys instead of torch
global state; samplers are closures over jittable integrators so a complete
N-step solve compiles to one XLA program.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from dimsum_tpu.transport import path as path_mod
from dimsum_tpu.transport.integrators import (
    ode_dopri5,
    ode_euler,
    ode_heun,
    sde_euler_maruyama,
    sde_heun,
)
from dimsum_tpu.transport.path import expand_t_like_x


class ModelType(enum.Enum):
    NOISE = enum.auto()
    SCORE = enum.auto()
    VELOCITY = enum.auto()


class PathType(enum.Enum):
    LINEAR = enum.auto()
    GVP = enum.auto()
    VP = enum.auto()


class WeightType(enum.Enum):
    NONE = enum.auto()
    VELOCITY = enum.auto()
    LIKELIHOOD = enum.auto()


def mean_flat(x):
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


@dataclasses.dataclass(frozen=True)
class Transport:
    model_type: ModelType
    path_type: PathType
    loss_type: WeightType
    train_eps: float
    sample_eps: float
    path_sampler: Any = None
    t_sample_mode: str = "uniform"

    # ------------------------------------------------------------------
    def prior_logp(self, z):
        """Standard normal log-density per sample (reference :69-77)."""
        shape = z.shape
        n = 1
        for s in shape[1:]:
            n *= s
        zf = z.reshape(shape[0], -1)
        return -n / 2.0 * math.log(2 * math.pi) - jnp.sum(zf ** 2, -1) / 2.0

    def check_interval(self, train_eps, sample_eps, *, diffusion_form="SBDM",
                       sde=False, reverse=False, eval=False,
                       last_step_size=0.0):
        t0, t1 = 0.0, 1.0
        eps = train_eps if not eval else sample_eps
        if isinstance(self.path_sampler, path_mod.VPCPlan):
            t1 = 1 - eps if (not sde or last_step_size == 0) \
                else 1 - last_step_size
        elif (isinstance(self.path_sampler,
                         (path_mod.ICPlan, path_mod.GVPCPlan))
              and (self.model_type != ModelType.VELOCITY or sde)):
            t0 = eps if (diffusion_form == "SBDM" and sde) \
                or self.model_type != ModelType.VELOCITY else 0
            t1 = 1 - eps if (not sde or last_step_size == 0) \
                else 1 - last_step_size
        if reverse:
            t0, t1 = 1 - t0, 1 - t1
        return t0, t1

    def sample(self, rng, x1):
        """Draw (t, x0, x1) for training (reference :109-125)."""
        k_noise, k_t = jax.random.split(rng)
        x0 = jax.random.normal(k_noise, x1.shape, x1.dtype)
        t0, t1 = self.check_interval(self.train_eps, self.sample_eps)
        if self.t_sample_mode == "logitnormal":
            a, b = -0.5, 1.0
            t = b * jax.random.normal(k_t, (x1.shape[0],)) + a
            t = jax.nn.sigmoid(t) * (t1 - t0) + t0
        else:
            t = jax.random.uniform(k_t, (x1.shape[0],)) * (t1 - t0) + t0
        return t.astype(jnp.float32), x0, x1

    def training_losses(self, model_fn: Callable, rng, x1,
                        model_kwargs: Optional[Dict] = None):
        """Per-sample flow-matching loss (reference :127-164).

        model_fn(x, t, **kwargs) -> model output.
        """
        model_kwargs = model_kwargs or {}
        t, x0, x1 = self.sample(rng, x1)
        t, xt, ut = self.path_sampler.plan(t, x0, x1)
        model_output = model_fn(xt, t, **model_kwargs)

        terms = {"pred": model_output}
        if self.model_type == ModelType.VELOCITY:
            terms["loss"] = mean_flat((model_output - ut) ** 2)
        else:
            _, drift_var = self.path_sampler.compute_drift(xt, t)
            sigma_t, _ = self.path_sampler.compute_sigma_t(
                expand_t_like_x(t, xt))
            if self.loss_type == WeightType.VELOCITY:
                weight = (drift_var / sigma_t) ** 2
            elif self.loss_type == WeightType.LIKELIHOOD:
                weight = drift_var / (sigma_t ** 2)
            else:
                weight = 1.0
            if self.model_type == ModelType.NOISE:
                terms["loss"] = mean_flat(weight * (model_output - x0) ** 2)
            else:
                terms["loss"] = mean_flat(
                    weight * (model_output * sigma_t + x0) ** 2)
        return terms

    # ------------------------------------------------------------------
    def get_drift(self):
        """Probability-flow ODE drift (reference :166-195)."""

        def score_ode(x, t, model_fn, **kw):
            drift_mean, drift_var = self.path_sampler.compute_drift(x, t)
            return -drift_mean + drift_var * model_fn(x, t, **kw)

        def noise_ode(x, t, model_fn, **kw):
            drift_mean, drift_var = self.path_sampler.compute_drift(x, t)
            sigma_t, _ = self.path_sampler.compute_sigma_t(
                expand_t_like_x(t, x))
            score = model_fn(x, t, **kw) / -sigma_t
            return -drift_mean + drift_var * score

        def velocity_ode(x, t, model_fn, **kw):
            return model_fn(x, t, **kw)

        return {ModelType.NOISE: noise_ode, ModelType.SCORE: score_ode,
                ModelType.VELOCITY: velocity_ode}[self.model_type]

    def get_score(self):
        """Score function from the model output (reference :197-218)."""
        if self.model_type == ModelType.NOISE:
            return lambda x, t, model_fn, **kw: model_fn(x, t, **kw) / \
                -self.path_sampler.compute_sigma_t(expand_t_like_x(t, x))[0]
        if self.model_type == ModelType.SCORE:
            return lambda x, t, model_fn, **kw: model_fn(x, t, **kw)
        return lambda x, t, model_fn, **kw: \
            self.path_sampler.get_score_from_velocity(
                model_fn(x, t, **kw), x, t)


class Sampler:
    """Sampling front-end (reference :221-445).  Sample functions take
    (x_init, model_fn, rng=None, **model_kwargs) and return x(t1)."""

    def __init__(self, transport: Transport):
        self.transport = transport
        self.drift = transport.get_drift()
        self.score = transport.get_score()

    # -- ODE -----------------------------------------------------------
    def sample_ode(self, *, sampling_method="dopri5", num_steps=50,
                   atol=1e-6, rtol=1e-3, reverse=False, return_nfe=False):
        if reverse:
            drift_raw = lambda x, t, model_fn, **kw: self.drift(
                x, jnp.ones_like(t) * (1 - t), model_fn, **kw)
        else:
            drift_raw = self.drift

        t0, t1 = self.transport.check_interval(
            self.transport.train_eps, self.transport.sample_eps, sde=False,
            eval=True, reverse=reverse, last_step_size=0.0)

        def sample_fn(x, model_fn, rng=None, **model_kwargs):
            drift = lambda x_, t_: drift_raw(x_, t_, model_fn,
                                             **model_kwargs)
            if sampling_method == "dopri5":
                return ode_dopri5(drift, x, t0, t1, rtol=rtol, atol=atol,
                                  return_nfe=return_nfe)
            if sampling_method in ("euler", "Euler"):
                return ode_euler(drift, x, t0, t1, num_steps)
            if sampling_method in ("heun", "Heun"):
                return ode_heun(drift, x, t0, t1, num_steps)
            raise NotImplementedError(sampling_method)

        return sample_fn

    # -- SDE -----------------------------------------------------------
    def sample_sde(self, *, sampling_method="Euler", diffusion_form="SBDM",
                   diffusion_norm=1.0, last_step="Mean", last_step_size=0.04,
                   num_steps=250):
        num_steps_eff = num_steps if sampling_method == "Euler" \
            else num_steps // 2
        if last_step is None:
            last_step_size = 0.0
        elif last_step_size == -1:
            last_step_size = 1.0 / num_steps_eff

        def diffusion_fn(x, t):
            return self.transport.path_sampler.compute_diffusion(
                x, t, form=diffusion_form, norm=diffusion_norm)

        def sde_drift(x, t, model_fn, **kw):
            return self.drift(x, t, model_fn, **kw) + \
                diffusion_fn(x, t) * self.score(x, t, model_fn, **kw)

        t0, t1 = self.transport.check_interval(
            self.transport.train_eps, self.transport.sample_eps,
            diffusion_form=diffusion_form, sde=True, eval=True,
            reverse=False, last_step_size=last_step_size)

        def last_step_fn(x, t, model_fn, **kw):
            if last_step is None:
                return x
            if last_step == "Mean":
                return x + sde_drift(x, t, model_fn, **kw) * last_step_size
            if last_step == "Tweedie":
                alpha = self.transport.path_sampler.compute_alpha_t
                sigma = self.transport.path_sampler.compute_sigma_t
                td = expand_t_like_x(t, x)
                a = alpha(td)[0]
                s = sigma(td)[0]
                return x / a + (s ** 2) / a * self.score(x, t, model_fn,
                                                         **kw)
            if last_step == "Euler":
                return x + self.drift(x, t, model_fn, **kw) * last_step_size
            raise NotImplementedError(last_step)

        def sample_fn(x, model_fn, rng, **model_kwargs):
            drift = lambda x_, t_: sde_drift(x_, t_, model_fn,
                                             **model_kwargs)
            stepper = sde_euler_maruyama if sampling_method == "Euler" \
                else sde_heun
            xs = stepper(drift, diffusion_fn, rng, x, t0, t1, num_steps_eff)
            ts = jnp.full((x.shape[0],), t1, jnp.float32)
            return last_step_fn(xs, ts, model_fn, **model_kwargs)

        return sample_fn

    # -- likelihood ------------------------------------------------------
    def sample_ode_likelihood(self, *, sampling_method="dopri5",
                              num_steps=50, atol=1e-6, rtol=1e-3):
        """Hutchinson-trace augmented reverse ODE (reference :388-445)."""

        t0, t1 = self.transport.check_interval(
            self.transport.train_eps, self.transport.sample_eps, sde=False,
            eval=True, reverse=False, last_step_size=0.0)

        def sample_fn(x, model_fn, rng, **model_kwargs):
            eps = jax.random.rademacher(rng, x.shape, jnp.float32)

            def aug_drift(state, t):
                xs, _ = state
                t_rev = jnp.ones_like(t) * (1 - t)

                def f(z):
                    return self.drift(z, t_rev, model_fn, **model_kwargs)

                drift_val, vjp_fn = jax.vjp(f, xs)
                (grad,) = vjp_fn(eps)
                logp_grad = jnp.sum(
                    grad * eps, axis=tuple(range(1, x.ndim)))
                return (-drift_val, logp_grad)

            init_logp = jnp.zeros((x.shape[0],), jnp.float32)

            # fixed-step Euler on the augmented system for TPU determinism
            from dimsum_tpu.transport.integrators import _tvec  # noqa
            import jax.lax as lax

            ts = jnp.linspace(t0, t1, max(num_steps, 2))

            def step(carry, i):
                xs, logp = carry
                t, t_next = ts[i], ts[i + 1]
                dx, dlogp = aug_drift((xs, logp), _tvec(xs, t))
                return (xs + (t_next - t) * dx,
                        logp + (t_next - t) * dlogp), None

            (x_final, dlogp), _ = lax.scan(
                step, (x, init_logp), jnp.arange(len(ts) - 1))
            prior = self.transport.prior_logp(x_final)
            return prior - dlogp, x_final

        return sample_fn
