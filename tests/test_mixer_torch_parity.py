"""Full-mixer parity against an independent torch implementation of the
reference Mamba equations (mamba_inner_ref structure,
/root/reference/mamba/mamba_ssm/ops/selective_scan_interface.py:1455):

  in_proj -> chunk(x, z) -> depthwise causal conv + silu -> x_proj ->
  (dt, B, C) -> dt_proj -> sequential selective scan (fp64) with D-skip and
  silu(z) gate -> out_proj

This exercises the torch->flax converter, the (B,L,D) layout transposes,
the conv semantics and the scan together -- two independently written
implementations must agree.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from dimsum_tpu.models.mamba import Mamba
from dimsum_tpu.utils.ckpt import convert_torch_state_dict


def torch_mamba_forward(sd, x_bld, d_state=16, d_conv=4):
    """x: (B, L, d_model) numpy.  All math in float64 torch."""
    x = torch.tensor(x_bld, dtype=torch.float64)
    B_, L, D = x.shape
    w = {k: torch.tensor(np.asarray(v), dtype=torch.float64)
         for k, v in sd.items()}
    d_inner = w["in_proj.weight"].shape[0] // 2
    dt_rank = w["dt_proj.weight"].shape[1]

    xz = x @ w["in_proj.weight"].T                       # (B, L, 2*di)
    xi, z = xz[..., :d_inner], xz[..., d_inner:]
    # depthwise causal conv over L (torch layout (B, D, L))
    xt = xi.permute(0, 2, 1)
    conv = F.conv1d(xt, w["conv1d.weight"], w["conv1d.bias"],
                    padding=d_conv - 1, groups=d_inner)[..., :L]
    xc = F.silu(conv).permute(0, 2, 1)                   # (B, L, di)

    dbl = xc @ w["x_proj.weight"].T
    dt_low = dbl[..., :dt_rank]
    Bm = dbl[..., dt_rank: dt_rank + d_state]
    Cm = dbl[..., dt_rank + d_state:]
    dt = dt_low @ w["dt_proj.weight"].T + w["dt_proj.bias"]
    dt = F.softplus(dt)                                  # (B, L, di)
    A = -torch.exp(w["A_log"])                           # (di, N)

    h = torch.zeros(B_, d_inner, d_state, dtype=torch.float64)
    ys = []
    for t in range(L):
        da = torch.exp(dt[:, t, :, None] * A[None])
        dbu = dt[:, t, :, None] * Bm[:, t, None, :] * xc[:, t, :, None]
        h = da * h + dbu
        ys.append(torch.einsum("bdn,bn->bd", h, Cm[:, t]))
    y = torch.stack(ys, dim=1) + xc * w["D"]
    y = y * F.silu(z)
    return (y @ w["out_proj.weight"].T).numpy()


def test_condmamba_matches_independent_torch_oracle():
    d_model, L, B_ = 32, 24, 2
    d_inner, d_state, d_conv = 2 * d_model, 16, 4
    dt_rank = math.ceil(d_model / 16)
    rng = np.random.default_rng(0)

    def r(*s):
        return (0.1 * rng.standard_normal(s)).astype(np.float32)

    sd = {
        "in_proj.weight": r(2 * d_inner, d_model),
        "conv1d.weight": r(d_inner, 1, d_conv),
        "conv1d.bias": r(d_inner),
        "x_proj.weight": r(dt_rank + 2 * d_state, d_inner),
        "dt_proj.weight": r(d_inner, dt_rank),
        "dt_proj.bias": r(d_inner),
        "cond_proj.weight": r(d_inner, d_model),
        "cond_proj.bias": r(d_inner),
        "A_log": np.abs(r(d_inner, d_state)),
        "D": np.ones(d_inner, np.float32),
        "out_proj.weight": r(d_model, d_inner),
    }

    x = rng.standard_normal((B_, L, d_model)).astype(np.float32)
    want = torch_mamba_forward(sd, x)

    m = Mamba(d_model=d_model, layer_idx=0, d_cond=d_model, scan_impl="xla")
    template = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                      jnp.zeros((B_, d_model)))["params"]
    params = convert_torch_state_dict(
        {f"mixer.{k}": v for k, v in sd.items()}, {"mixer": template},
        strict=True)["mixer"]
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x),
                             jnp.zeros((B_, d_model))))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_condmamba_oracle_parity_with_pallas_interpret():
    """Same oracle through the Pallas kernel path (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    d_model, L, B_ = 64, 32, 1
    d_inner, d_state, d_conv = 2 * d_model, 16, 4
    dt_rank = math.ceil(d_model / 16)
    rng = np.random.default_rng(1)

    def r(*s):
        return (0.1 * rng.standard_normal(s)).astype(np.float32)

    sd = {
        "in_proj.weight": r(2 * d_inner, d_model),
        "conv1d.weight": r(d_inner, 1, d_conv),
        "conv1d.bias": r(d_inner),
        "x_proj.weight": r(dt_rank + 2 * d_state, d_inner),
        "dt_proj.weight": r(d_inner, dt_rank),
        "dt_proj.bias": r(d_inner),
        "A_log": np.abs(r(d_inner, d_state)),
        "D": np.ones(d_inner, np.float32),
        "out_proj.weight": r(d_model, d_inner),
    }
    x = rng.standard_normal((B_, L, d_model)).astype(np.float32)
    want = torch_mamba_forward(sd, x)

    m = Mamba(d_model=d_model, layer_idx=0, scan_impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        template = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        params = convert_torch_state_dict(
            {f"mixer.{k}": v for k, v in sd.items()}, {"mixer": template},
            strict=True)["mixer"]
        got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)
