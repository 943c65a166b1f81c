"""Coupling plans (interpolants): Linear (IC), VP, GVP — pure JAX.

Reference: `/root/reference/dimsum/transport/path.py`.
alpha_t multiplies the DATA x1, sigma_t multiplies the NOISE x0; time runs
noise (t=0) -> data (t=1).  The published DiMSUM config uses GVP
(alpha = sin(pi t / 2), sigma = cos(pi t / 2)) with velocity prediction.
"""

from __future__ import annotations

import dataclasses
import math
import jax.numpy as jnp

from dimsum_tpu.ops.dct import dct_2d, idct_2d


def expand_t_like_x(t, x):
    """(B,) -> (B, 1, 1, ...) matching x's rank."""
    return t.reshape(t.shape[0], *([1] * (x.ndim - 1)))


def dct_blur(x, patch_size: int, blur_sigmas, min_scale: float = 1e-3):
    """Frequency-domain blurring of x (reference path.py:249-259 DCTBlur):
    patchwise DCT, exponential low-pass scheduled by blur_sigmas, inverse."""
    freqs = math.pi * jnp.linspace(0, patch_size - 1, patch_size) / patch_size
    freq_sq = freqs[:, None] ** 2 + freqs[None, :] ** 2
    t_blur = jnp.asarray(blur_sigmas) ** 2 / 2.0
    coefs = dct_2d(x, patch_size, norm="ortho")
    scale = x.shape[-1] // patch_size
    mask = jnp.tile(freq_sq, (scale, scale))
    attenuation = jnp.exp(-mask * t_blur) * (1 - min_scale) + min_scale
    return idct_2d(coefs * attenuation, patch_size, norm="ortho")


@dataclasses.dataclass(frozen=True)
class ICPlan:
    """Linear coupling: alpha_t = t, sigma_t = 1 - t."""

    sigma: float = 0.0
    use_blurring: bool = False
    blur_sigma_max: float = 3.0
    blur_upscale: int = 4

    # -- schedule ----------------------------------------------------------
    def compute_alpha_t(self, t):
        return t, jnp.ones_like(t)

    def compute_sigma_t(self, t):
        return 1 - t, -jnp.ones_like(t)

    def compute_d_alpha_alpha_ratio_t(self, t):
        return 1 / t

    # -- SDE pieces ---------------------------------------------------------
    def compute_drift(self, x, t):
        """Returns (-drift_mean, diffusion_var) in score parametrization."""
        t = expand_t_like_x(t, x)
        alpha_ratio = self.compute_d_alpha_alpha_ratio_t(t)
        sigma_t, d_sigma_t = self.compute_sigma_t(t)
        drift = alpha_ratio * x
        diffusion = alpha_ratio * (sigma_t ** 2) - sigma_t * d_sigma_t
        return -drift, diffusion

    def compute_diffusion(self, x, t, form: str = "constant",
                          norm: float = 1.0):
        t = expand_t_like_x(t, x)
        choices = {
            "none": lambda: jnp.zeros_like(t),
            "constant": lambda: jnp.full_like(t, norm),
            "SBDM": lambda: norm * 2.0 * self._diffusion_sbdm(x, t),
            "sigma": lambda: norm * self.compute_sigma_t(t)[0],
            "linear": lambda: norm * (1 - t),
            "decreasing": lambda: 0.25 * (norm * jnp.cos(jnp.pi * t) + 1) ** 2,
            "increasing-decreasing":
                lambda: norm * jnp.sin(jnp.pi * t) ** 2,
            "log": lambda: norm * jnp.log(t - t ** 2 + 1),
        }
        if form not in choices:
            raise NotImplementedError(f"Diffusion form {form}")
        return choices[form]()

    def _diffusion_sbdm(self, x, t_expanded):
        alpha_ratio = self.compute_d_alpha_alpha_ratio_t(t_expanded)
        sigma_t, d_sigma_t = self.compute_sigma_t(t_expanded)
        return alpha_ratio * (sigma_t ** 2) - sigma_t * d_sigma_t

    # -- parameterization conversions ---------------------------------------
    def get_score_from_velocity(self, velocity, x, t):
        t = expand_t_like_x(t, x)
        alpha_t, d_alpha_t = self.compute_alpha_t(t)
        sigma_t, d_sigma_t = self.compute_sigma_t(t)
        reverse_alpha_ratio = alpha_t / d_alpha_t
        var = sigma_t ** 2 - reverse_alpha_ratio * d_sigma_t * sigma_t
        return (reverse_alpha_ratio * velocity - x) / var

    def get_noise_from_velocity(self, velocity, x, t):
        t = expand_t_like_x(t, x)
        alpha_t, d_alpha_t = self.compute_alpha_t(t)
        sigma_t, d_sigma_t = self.compute_sigma_t(t)
        reverse_alpha_ratio = alpha_t / d_alpha_t
        var = reverse_alpha_ratio * d_sigma_t - sigma_t
        return (reverse_alpha_ratio * velocity - x) / var

    def get_velocity_from_score(self, score, x, t):
        drift, var = self.compute_drift(x, t)
        return var * score - drift

    # -- interpolant ---------------------------------------------------------
    def compute_mu_t(self, t, x0, x1):
        t = expand_t_like_x(t, x1)
        alpha_t, _ = self.compute_alpha_t(t)
        sigma_t, _ = self.compute_sigma_t(t)
        if self.use_blurring:
            blur_sigmas = self.blur_sigma_max * jnp.sin(
                sigma_t * jnp.pi / 2) ** 2
            x1 = dct_blur(x1, self.blur_upscale, blur_sigmas)
        return alpha_t * x1 + sigma_t * x0

    def compute_xt(self, t, x0, x1):
        return self.compute_mu_t(t, x0, x1)

    def compute_ut(self, t, x0, x1, xt):
        t = expand_t_like_x(t, x1)
        _, d_alpha_t = self.compute_alpha_t(t)
        _, d_sigma_t = self.compute_sigma_t(t)
        return d_alpha_t * x1 + d_sigma_t * x0

    def plan(self, t, x0, x1):
        xt = self.compute_xt(t, x0, x1)
        ut = self.compute_ut(t, x0, x1, xt)
        return t, xt, ut


@dataclasses.dataclass(frozen=True)
class VPCPlan(ICPlan):
    """VP path (reference path.py:191-219)."""

    sigma_min: float = 0.1
    sigma_max: float = 20.0

    def _log_mean_coeff(self, t):
        return (-0.25 * ((1 - t) ** 2) * (self.sigma_max - self.sigma_min)
                - 0.5 * (1 - t) * self.sigma_min)

    def _d_log_mean_coeff(self, t):
        return (0.5 * (1 - t) * (self.sigma_max - self.sigma_min)
                + 0.5 * self.sigma_min)

    def compute_alpha_t(self, t):
        alpha_t = jnp.exp(self._log_mean_coeff(t))
        return alpha_t, alpha_t * self._d_log_mean_coeff(t)

    def compute_sigma_t(self, t):
        p = 2 * self._log_mean_coeff(t)
        sigma_t = jnp.sqrt(1 - jnp.exp(p))
        d_sigma_t = jnp.exp(p) * (2 * self._d_log_mean_coeff(t)) / (
            -2 * sigma_t)
        return sigma_t, d_sigma_t

    def compute_d_alpha_alpha_ratio_t(self, t):
        return self._d_log_mean_coeff(t)

    def compute_drift(self, x, t):
        t = expand_t_like_x(t, x)
        beta_t = self.sigma_min + (1 - t) * (self.sigma_max - self.sigma_min)
        return -0.5 * beta_t * x, beta_t / 2


@dataclasses.dataclass(frozen=True)
class GVPCPlan(ICPlan):
    """GVP path: alpha = sin(pi t/2), sigma = cos(pi t/2) — the published
    DiMSUM config (reference path.py:222-241)."""

    def compute_alpha_t(self, t):
        return (jnp.sin(t * jnp.pi / 2),
                jnp.pi / 2 * jnp.cos(t * jnp.pi / 2))

    def compute_sigma_t(self, t):
        return (jnp.cos(t * jnp.pi / 2),
                -jnp.pi / 2 * jnp.sin(t * jnp.pi / 2))

    def compute_d_alpha_alpha_ratio_t(self, t):
        return jnp.pi / (2 * jnp.tan(t * jnp.pi / 2))
