"""Implementation-level parity vs the REAL reference code (VERDICT round-1
item 1).  Each case spawns tests/run_reference_parity.py in a subprocess so
the reference-import shims (tests/refshim.py mutates sys.modules) and the
fp64 jax config never leak into this process.

The subprocess instantiates the reference's own DiM / CondMamba
(models_dim.py:1557, mamba_simple.py:438) on CPU with every fused/CUDA
entry point routed to the reference's published pure-torch oracles, pushes
the perturbed state dict through utils/ckpt.py::convert_torch_state_dict
(strict -- validates the converter key-for-key), and asserts logit parity
< 1e-4 at float64 (observed ~2e-7, limited by the reference's internal
fp32 islands such as selective_scan_ref's `.float()` casts).
"""

import json
import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "run_reference_parity.py")


def _run(config: str):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    proc = subprocess.run(
        [sys.executable, SCRIPT, config],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, (
        f"reference parity subprocess failed for {config}:\n"
        f"--- stdout ---\n{proc.stdout[-3000:]}\n"
        f"--- stderr ---\n{proc.stderr[-3000:]}")
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_reference_parity_combined():
    """The published architecture (block-type combined, CondMamba,
    RMSNorm+fused add-norm, attn every k)."""
    res = _run("combined")
    assert res["max_abs_diff"] < 1e-4


@pytest.mark.slow
@pytest.mark.parametrize(
    "config", ["combined_fourier", "v2", "zigzag", "window", "wave",
               "raw", "combined_einfft", "moe"])
def test_reference_parity_variants(config):
    res = _run(config)
    assert res["max_abs_diff"] < 1e-4
