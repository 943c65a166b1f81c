"""ODE/SDE integrators, TPU-native: fixed-step solvers as `lax.scan` (one
compiled program, deterministic NFE) and an adaptive Dormand-Prince 5(4)
via `lax.while_loop`.

Reference: `/root/reference/dimsum/transport/integrators.py` (Euler-Maruyama
and Heun SDE steppers :5-73; torchdiffeq odeint wrapper :76-111).  The
reference leans on torchdiffeq's dopri5 -- a host-side python loop with
per-step CUDA launches.  Here the entire solve, adaptive control included,
compiles to a single XLA program.

Drift signature: drift(x, t_vec) -> dx/dt, with t_vec shaped (batch,).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _tvec(x, t_scalar):
    return jnp.full((x.shape[0],), t_scalar, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# Fixed-step ODE
# ---------------------------------------------------------------------------


def ode_euler(drift, x, t0: float, t1: float, num_steps: int,
              return_trajectory: bool = False):
    """Euler over linspace(t0, t1, num_steps): num_steps-1 function evals
    (matching torchdiffeq's fixed-grid Euler on the reference's t grid)."""
    ts = jnp.linspace(t0, t1, num_steps)

    def step(x, i):
        t, t_next = ts[i], ts[i + 1]
        x_new = x + (t_next - t) * drift(x, _tvec(x, t))
        return x_new, (x_new if return_trajectory else None)

    x_final, traj = lax.scan(step, x, jnp.arange(num_steps - 1))
    return (x_final, traj) if return_trajectory else x_final


def ode_heun(drift, x, t0: float, t1: float, num_steps: int):
    ts = jnp.linspace(t0, t1, num_steps)

    def step(x, i):
        t, t_next = ts[i], ts[i + 1]
        dt = t_next - t
        k1 = drift(x, _tvec(x, t))
        k2 = drift(x + dt * k1, _tvec(x, t_next))
        return x + dt * 0.5 * (k1 + k2), None

    x_final, _ = lax.scan(step, x, jnp.arange(num_steps - 1))
    return x_final


# ---------------------------------------------------------------------------
# Adaptive Dormand-Prince 5(4)
# ---------------------------------------------------------------------------

# Butcher tableau (standard DOPRI5, same as torchdiffeq/diffrax).
# numpy on purpose: module-level jnp.array would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize in any
# CLI that imports transport before init_distributed (sample_ddp.py
# multi-host); the constants convert at trace time anyway.
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B5 = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784,
                 11 / 84, 0.0])
_B4 = np.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                 -92097 / 339200, 187 / 2100, 1 / 40])


class _Dopri5State(NamedTuple):
    t: jnp.ndarray
    x: jnp.ndarray
    dt: jnp.ndarray
    k_last: jnp.ndarray  # FSAL: k7 of the accepted step == k1 of the next
    nfe: jnp.ndarray


def ode_dopri5(drift, x, t0: float, t1: float, rtol: float = 1e-3,
               atol: float = 1e-6, max_steps: int = 10_000,
               first_dt: float | None = None, return_nfe: bool = False):
    """Adaptive RK45 with PI-free standard step control, fully jittable.

    Solves from t0 to t1 (t1 > t0) and returns x(t1) (and NFE if asked).
    """
    span = t1 - t0

    def f(x_, t_):
        return drift(x_, _tvec(x_, t_))

    k1_init = f(x, jnp.asarray(t0, jnp.float32))

    if first_dt is not None:
        dt0 = jnp.asarray(first_dt, jnp.float32)
    else:
        # Hairer's automatic initial step (what torchdiffeq/diffrax use):
        # costs one extra drift eval, buys dopri5 NFE parity.
        scale = atol + rtol * jnp.abs(x)
        d0 = jnp.sqrt(jnp.mean((x / scale) ** 2))
        d1 = jnp.sqrt(jnp.mean((k1_init / scale) ** 2))
        h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
        x1 = x + h0 * k1_init
        f1 = f(x1, jnp.asarray(t0, jnp.float32) + h0)
        d2 = jnp.sqrt(jnp.mean(((f1 - k1_init) / scale) ** 2)) / h0
        h1 = jnp.where(
            jnp.maximum(d1, d2) <= 1e-15,
            jnp.maximum(1e-6, h0 * 1e-3),
            (0.01 / jnp.maximum(d1, d2)) ** 0.2,
        )
        dt0 = jnp.minimum(jnp.minimum(100 * h0, h1),
                          jnp.asarray(span, jnp.float32))

    def cond(s: _Dopri5State):
        return (s.t < t1) & (s.nfe < max_steps * 6)

    def body(s: _Dopri5State):
        dt = jnp.minimum(s.dt, t1 - s.t)
        ks = [s.k_last]  # FSAL
        for i in range(1, 7):
            xi = s.x
            for j, aij in enumerate(_A[i]):
                xi = xi + dt * aij * ks[j]
            ks.append(f(xi, s.t + _C[i] * dt))
        k = jnp.stack(ks)  # (7, ...)
        b5 = _B5.reshape(7, *([1] * s.x.ndim))
        b4 = _B4.reshape(7, *([1] * s.x.ndim))
        x5 = s.x + dt * jnp.sum(b5 * k, axis=0)
        x4 = s.x + dt * jnp.sum(b4 * k, axis=0)

        err = x5 - x4
        scale = atol + rtol * jnp.maximum(jnp.abs(s.x), jnp.abs(x5))
        err_norm = jnp.sqrt(jnp.mean((err / scale) ** 2))

        accept = err_norm <= 1.0
        # standard step-size controller
        factor = jnp.clip(0.9 * (1.0 / jnp.maximum(err_norm, 1e-10))
                          ** 0.2, 0.2, 10.0)
        dt_next = dt * factor

        new_t = jnp.where(accept, s.t + dt, s.t)
        new_x = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), x5, s.x)
        new_k = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), ks[6], s.k_last)
        return _Dopri5State(new_t, new_x, dt_next, new_k, s.nfe + 6)

    init = _Dopri5State(jnp.asarray(t0, jnp.float32), x, dt0, k1_init,
                        jnp.asarray(1, jnp.int32))
    final = lax.while_loop(cond, body, init)
    return (final.x, final.nfe) if return_nfe else final.x


# ---------------------------------------------------------------------------
# SDE
# ---------------------------------------------------------------------------


def sde_euler_maruyama(drift, diffusion, rng, x, t0: float, t1: float,
                       num_steps: int):
    """Euler-Maruyama over linspace(t0, t1, num_steps), iterating t[:-1]
    (reference integrators.py:28-37).  Returns x after the loop (the caller
    applies the configured last-step function at t1)."""
    ts = jnp.linspace(t0, t1, num_steps)
    dt = ts[1] - ts[0]

    def step(carry, i):
        x, key = carry
        key, sub = jax.random.split(key)
        t = ts[i]
        w = jax.random.normal(sub, x.shape, x.dtype)
        dw = w * jnp.sqrt(dt)
        d = drift(x, _tvec(x, t))
        g = diffusion(x, _tvec(x, t))
        mean_x = x + d * dt
        x_new = mean_x + jnp.sqrt(2 * g) * dw
        return (x_new, key), None

    (x_final, _), _ = lax.scan(step, (x, rng), jnp.arange(num_steps - 1))
    return x_final


def sde_heun(drift, diffusion, rng, x, t0: float, t1: float, num_steps: int):
    """Heun SDE stepper (reference integrators.py:39-48)."""
    ts = jnp.linspace(t0, t1, num_steps)
    dt = ts[1] - ts[0]

    def step(carry, i):
        x, key = carry
        key, sub = jax.random.split(key)
        t = ts[i]
        w = jax.random.normal(sub, x.shape, x.dtype)
        dw = w * jnp.sqrt(dt)
        g = diffusion(x, _tvec(x, t))
        xhat = x + jnp.sqrt(2 * g) * dw
        k1 = drift(xhat, _tvec(x, t))
        xp = xhat + dt * k1
        k2 = drift(xp, _tvec(x, t + dt))
        return (xhat + 0.5 * dt * (k1 + k2), key), None

    (x_final, _), _ = lax.scan(step, (x, rng), jnp.arange(num_steps - 1))
    return x_final
