"""ADM-style Gaussian diffusion (DDPM/DDIM) in JAX.

Reference: `/root/reference/dimsum/diffusion/` (gaussian_diffusion.py,
respace.py, timestep_sampler.py) -- the classic guided-diffusion stack the
reference vendors (unused by its train/sample paths, kept for API
completeness).  Pure functional: all schedule arrays are precomputed numpy
constants gathered by timestep inside jit.
"""

from __future__ import annotations

import enum
import math
from typing import Any, Dict, Sequence

import numpy as np
import jax
import jax.numpy as jnp


class ModelMeanType(enum.Enum):
    PREVIOUS_X = enum.auto()
    START_X = enum.auto()
    EPSILON = enum.auto()


class ModelVarType(enum.Enum):
    LEARNED = enum.auto()
    FIXED_SMALL = enum.auto()
    FIXED_LARGE = enum.auto()
    LEARNED_RANGE = enum.auto()


class LossType(enum.Enum):
    MSE = enum.auto()
    RESCALED_MSE = enum.auto()
    KL = enum.auto()
    RESCALED_KL = enum.auto()


def get_named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    if name == "linear":
        scale = 1000 / num_steps
        return np.linspace(scale * 1e-4, scale * 2e-2, num_steps,
                           dtype=np.float64)
    if name == "cosine":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = []
        for i in range(num_steps):
            t1, t2 = i / num_steps, (i + 1) / num_steps
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), 0.999))
        return np.array(betas, np.float64)
    raise NotImplementedError(name)


def _extract(arr: np.ndarray, t, shape):
    """Gather per-timestep scalars and broadcast to shape."""
    out = jnp.asarray(arr, jnp.float32)[t]
    return out.reshape(t.shape[0], *([1] * (len(shape) - 1)))


def mean_flat(x):
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """Log-likelihood of a discretized Gaussian (ADM losses)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = jax.scipy.stats.norm.cdf(plus_in)
    cdf_min = jax.scipy.stats.norm.cdf(min_in)
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.maximum(cdf_delta, 1e-12))))


class GaussianDiffusion:
    def __init__(self, *, betas: np.ndarray,
                 model_mean_type=ModelMeanType.EPSILON,
                 model_var_type=ModelVarType.FIXED_SMALL,
                 loss_type=LossType.MSE):
        self.model_mean_type = model_mean_type
        self.model_var_type = model_var_type
        self.loss_type = loss_type
        betas = np.asarray(betas, np.float64)
        self.betas = betas
        self.num_timesteps = len(betas)
        alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(alphas)
        self.alphas_cumprod_prev = np.append(1.0, self.alphas_cumprod[:-1])
        # the ADM linear schedule scales beta_end by 1000/T, so small T
        # drives beta past 1.0 and alphas_cumprod through 0/negative: the
        # affected coefficient entries are inf/nan AT THOSE INDICES, same
        # values as the reference's vendored ADM table -- computed silently
        # instead of spraying RuntimeWarnings
        with np.errstate(divide="ignore", invalid="ignore"):
            self.sqrt_alphas_cumprod = np.sqrt(self.alphas_cumprod)
            self.sqrt_one_minus_alphas_cumprod = np.sqrt(
                1.0 - self.alphas_cumprod)
            self.sqrt_recip_alphas_cumprod = np.sqrt(
                1.0 / self.alphas_cumprod)
            self.sqrt_recipm1_alphas_cumprod = np.sqrt(
                1.0 / self.alphas_cumprod - 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            self.posterior_variance = (
                betas * (1.0 - self.alphas_cumprod_prev)
                / (1.0 - self.alphas_cumprod))
            self.posterior_log_variance_clipped = np.log(
                np.append(self.posterior_variance[1],
                          self.posterior_variance[1:]))
            self.posterior_mean_coef1 = (
                betas * np.sqrt(self.alphas_cumprod_prev)
                / (1.0 - self.alphas_cumprod))
            self.posterior_mean_coef2 = (
                (1.0 - self.alphas_cumprod_prev) * np.sqrt(alphas)
                / (1.0 - self.alphas_cumprod))

    # -- q --------------------------------------------------------------
    def q_sample(self, x_start, t, noise):
        return (_extract(self.sqrt_alphas_cumprod, t, x_start.shape) * x_start
                + _extract(self.sqrt_one_minus_alphas_cumprod, t,
                           x_start.shape) * noise)

    def q_posterior_mean_variance(self, x_start, x_t, t):
        mean = (_extract(self.posterior_mean_coef1, t, x_t.shape) * x_start
                + _extract(self.posterior_mean_coef2, t, x_t.shape) * x_t)
        var = _extract(self.posterior_variance, t, x_t.shape)
        logvar = _extract(self.posterior_log_variance_clipped, t, x_t.shape)
        return mean, var, logvar

    def _predict_xstart_from_eps(self, x_t, t, eps):
        return (_extract(self.sqrt_recip_alphas_cumprod, t, x_t.shape) * x_t
                - _extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.shape)
                * eps)

    def _predict_eps_from_xstart(self, x_t, t, x_start):
        return ((_extract(self.sqrt_recip_alphas_cumprod, t, x_t.shape) * x_t
                 - x_start)
                / _extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.shape))

    # -- p --------------------------------------------------------------
    def p_mean_variance(self, model_fn, x, t, clip_denoised=True,
                        model_kwargs=None):
        model_kwargs = model_kwargs or {}
        out = model_fn(x, t, **model_kwargs)
        C = x.shape[1]
        if self.model_var_type in (ModelVarType.LEARNED,
                                   ModelVarType.LEARNED_RANGE):
            out, var_raw = out[:, :C], out[:, C:]
            if self.model_var_type == ModelVarType.LEARNED:
                model_logvar = var_raw
            else:
                min_log = _extract(self.posterior_log_variance_clipped, t,
                                   x.shape)
                max_log = _extract(np.log(self.betas), t, x.shape)
                frac = (var_raw + 1) / 2
                model_logvar = frac * max_log + (1 - frac) * min_log
            model_var = jnp.exp(model_logvar)
        elif self.model_var_type == ModelVarType.FIXED_SMALL:
            model_var = _extract(self.posterior_variance, t, x.shape)
            model_logvar = _extract(self.posterior_log_variance_clipped, t,
                                    x.shape)
        else:  # FIXED_LARGE
            var = np.append(self.posterior_variance[1], self.betas[1:])
            model_var = _extract(var, t, x.shape)
            model_logvar = _extract(np.log(var), t, x.shape)

        def clip(v):
            return jnp.clip(v, -1, 1) if clip_denoised else v

        if self.model_mean_type == ModelMeanType.EPSILON:
            x_start = clip(self._predict_xstart_from_eps(x, t, out))
        elif self.model_mean_type == ModelMeanType.START_X:
            x_start = clip(out)
        else:
            raise NotImplementedError(self.model_mean_type)
        mean, _, _ = self.q_posterior_mean_variance(x_start, x, t)
        return {"mean": mean, "variance": model_var,
                "log_variance": model_logvar, "pred_xstart": x_start}

    def p_sample(self, model_fn, x, t, rng, clip_denoised=True,
                 model_kwargs=None):
        out = self.p_mean_variance(model_fn, x, t, clip_denoised,
                                   model_kwargs)
        noise = jax.random.normal(rng, x.shape, x.dtype)
        nonzero = (t != 0).reshape(-1, *([1] * (x.ndim - 1)))
        return out["mean"] + nonzero * jnp.exp(
            0.5 * out["log_variance"]) * noise

    def p_sample_loop(self, model_fn, shape, rng, clip_denoised=True,
                      model_kwargs=None):
        """Full ancestral sampling as one lax.scan program."""
        rng, k0 = jax.random.split(rng)
        x = jax.random.normal(k0, shape)

        def step(carry, t_scalar):
            x, key = carry
            key, sub = jax.random.split(key)
            t = jnp.full((shape[0],), t_scalar, jnp.int32)
            x = self.p_sample(model_fn, x, t, sub, clip_denoised,
                              model_kwargs)
            return (x, key), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (x, _), _ = jax.lax.scan(step, (x, rng), ts)
        return x

    def ddim_sample_loop(self, model_fn, shape, rng, eta=0.0,
                         clip_denoised=True, model_kwargs=None):
        rng, k0 = jax.random.split(rng)
        x = jax.random.normal(k0, shape)

        def step(carry, t_scalar):
            x, key = carry
            key, sub = jax.random.split(key)
            t = jnp.full((shape[0],), t_scalar, jnp.int32)
            out = self.p_mean_variance(model_fn, x, t, clip_denoised,
                                       model_kwargs)
            eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
            ab = _extract(self.alphas_cumprod, t, x.shape)
            ab_prev = _extract(self.alphas_cumprod_prev, t, x.shape)
            sigma = (eta * jnp.sqrt((1 - ab_prev) / (1 - ab))
                     * jnp.sqrt(1 - ab / ab_prev))
            noise = jax.random.normal(sub, x.shape, x.dtype)
            mean = (out["pred_xstart"] * jnp.sqrt(ab_prev)
                    + jnp.sqrt(1 - ab_prev - sigma ** 2) * eps)
            nonzero = (t != 0).reshape(-1, *([1] * (x.ndim - 1)))
            return (mean + nonzero * sigma * noise, key), None

        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        (x, _), _ = jax.lax.scan(step, (x, rng), ts)
        return x

    # -- losses ----------------------------------------------------------
    def training_losses(self, model_fn, x_start, t, rng, model_kwargs=None):
        noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        terms: Dict[str, Any] = {}
        if self.loss_type in (LossType.MSE, LossType.RESCALED_MSE):
            out = model_fn(x_t, t, **(model_kwargs or {}))
            C = x_start.shape[1]
            if self.model_var_type in (ModelVarType.LEARNED,
                                       ModelVarType.LEARNED_RANGE):
                out, var_raw = out[:, :C], out[:, C:]
                # vb term with frozen mean (ADM's detached-mean trick)
                frozen = lambda *a, **k: jnp.concatenate(
                    [jax.lax.stop_gradient(out), var_raw], axis=1)
                terms["vb"] = self._vb_terms(frozen, x_start, x_t, t)
            target = {ModelMeanType.EPSILON: noise,
                      ModelMeanType.START_X: x_start}[self.model_mean_type]
            terms["mse"] = mean_flat((target - out) ** 2)
            terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
        else:
            terms["loss"] = self._vb_terms(
                lambda x, tt, **k: model_fn(x, tt, **(model_kwargs or {})),
                x_start, x_t, t)
        return terms

    def _vb_terms(self, model_fn, x_start, x_t, t):
        true_mean, _, true_logvar = self.q_posterior_mean_variance(
            x_start, x_t, t)
        out = self.p_mean_variance(model_fn, x_t, t)
        kl = mean_flat(normal_kl(true_mean, true_logvar, out["mean"],
                                 out["log_variance"])) / math.log(2.0)
        nll = -mean_flat(discretized_gaussian_log_likelihood(
            x_start, out["mean"], 0.5 * out["log_variance"])) / math.log(2.0)
        return jnp.where(t == 0, nll, kl)


# ---------------------------------------------------------------------------
# respacing + timestep samplers
# ---------------------------------------------------------------------------


def space_timesteps(num_timesteps: int, section_counts) -> Sequence[int]:
    """Reference respace.py: 'ddimN' or comma-separated section counts."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return list(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired} ddim steps")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start, taken = 0, []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if count > size:
            raise ValueError(f"cannot take {count} from {size}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            taken.append(start + round(cur))
            cur += stride
        start += size
    return taken


def spaced_diffusion(base_betas: np.ndarray, use_timesteps,
                     **kwargs) -> GaussianDiffusion:
    """Build a respaced GaussianDiffusion over a timestep subset."""
    use_timesteps = sorted(set(use_timesteps))
    alphas_cumprod = np.cumprod(1.0 - np.asarray(base_betas, np.float64))
    last = 1.0
    new_betas = []
    for i in use_timesteps:
        new_betas.append(1 - alphas_cumprod[i] / last)
        last = alphas_cumprod[i]
    return GaussianDiffusion(betas=np.array(new_betas), **kwargs)


class UniformSampler:
    def __init__(self, diffusion: GaussianDiffusion):
        self.n = diffusion.num_timesteps

    def sample(self, rng, batch):
        t = jax.random.randint(rng, (batch,), 0, self.n)
        return t, jnp.ones((batch,), jnp.float32)


class LossSecondMomentResampler:
    """Importance-samples timesteps by loss second moment
    (reference timestep_sampler.py)."""

    def __init__(self, diffusion: GaussianDiffusion, history: int = 10,
                 uniform_prob: float = 1e-3):
        self.n = diffusion.num_timesteps
        self.history = history
        self.uniform_prob = uniform_prob
        self._losses = np.zeros((self.n, history), np.float64)
        self._counts = np.zeros(self.n, np.int64)

    def weights(self) -> np.ndarray:
        if not (self._counts == self.history).all():
            return np.ones(self.n) / self.n
        w = np.sqrt(np.mean(self._losses ** 2, axis=-1))
        w = w / w.sum()
        return w * (1 - self.uniform_prob) + self.uniform_prob / self.n

    def sample(self, rng, batch):
        w = self.weights()
        t = jax.random.choice(rng, self.n, (batch,), p=jnp.asarray(w))
        inv = 1.0 / (self.n * w)
        return t, jnp.asarray(inv, jnp.float32)[t]

    def update(self, ts: np.ndarray, losses: np.ndarray):
        for t, loss in zip(np.asarray(ts), np.asarray(losses)):
            if self._counts[t] == self.history:
                self._losses[t, :-1] = self._losses[t, 1:]
                self._losses[t, -1] = loss
            else:
                self._losses[t, self._counts[t]] = loss
                self._counts[t] += 1
