"""Mamba LM stack tests: forward shapes, step-vs-full parity, generation."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from dimsum_tpu.models.lm import (
    MambaLMConfig, MambaLMHeadModel, generate, mamba_step,
)
from dimsum_tpu.models.mamba import Mamba


def test_lm_forward_shapes():
    cfg = MambaLMConfig(d_model=32, n_layer=2, vocab_size=100,
                        scan_impl="xla")
    model = MambaLMHeadModel(cfg)
    ids = jnp.arange(8).reshape(2, 4).astype(jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(params, ids)
    assert logits.shape == (2, 4, cfg.padded_vocab)
    assert cfg.padded_vocab == 104  # padded to multiple of 8


def test_mamba_step_matches_full_forward():
    """Sequential single-token steps must reproduce the full-sequence scan
    (the decode-path correctness oracle, reference test strategy 2.3)."""
    d_model, L, B = 16, 10, 2
    m = Mamba(d_model=d_model, layer_idx=0, scan_impl="xla")
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, d_model))
    variables = m.init(jax.random.PRNGKey(1), x)
    full = m.apply(variables, x)

    p = variables["params"]
    dt_rank = math.ceil(d_model / 16)
    conv_state = jnp.zeros((B, 4, 2 * d_model))
    ssm_state = jnp.zeros((B, 2 * d_model, 16))
    outs = []
    for t in range(L):
        y, conv_state, ssm_state = mamba_step(
            p, x[:, t], conv_state, ssm_state, dt_rank=dt_rank)
        outs.append(y)
    step_out = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(step_out), np.asarray(full),
                               rtol=2e-3, atol=2e-3)


def test_generate_greedy_deterministic():
    cfg = MambaLMConfig(d_model=32, n_layer=2, vocab_size=50,
                        scan_impl="xla")
    model = MambaLMHeadModel(cfg)
    ids = jnp.array([[1, 2, 3]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    out1 = generate(params, cfg, ids, max_new_tokens=5, temperature=0.0)
    out2 = generate(params, cfg, ids, max_new_tokens=5, temperature=0.0)
    assert out1.shape == (1, 8)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # prompt is preserved
    np.testing.assert_array_equal(np.asarray(out1[0, :3]), [1, 2, 3])


def test_generate_consistent_with_forward():
    """Greedy decode's first generated token must equal argmax of the full
    forward's last-position logits."""
    cfg = MambaLMConfig(d_model=32, n_layer=2, vocab_size=50,
                        scan_impl="xla")
    model = MambaLMHeadModel(cfg)
    ids = jnp.array([[5, 9, 2, 7]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(params, ids)
    want_next = int(jnp.argmax(logits[0, -1]))
    out = generate(params, cfg, ids, max_new_tokens=2, temperature=0.0)
    assert int(out[0, 4]) == want_next
