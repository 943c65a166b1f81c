"""training_stats collective collector + lm-eval harness scorer.

Reference twins: eval_toolbox/torch_utils/training_stats.py (moment
accumulation, Collector windowing) and mamba/evals/lm_harness_eval.py
(loglikelihood contract)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dimsum_tpu.utils import training_stats as ts


@pytest.fixture(autouse=True)
def _clean_stats():
    ts.reset()
    yield
    ts.reset()


def test_collector_mean_std_match_numpy():
    c = ts.Collector()  # construct first: init baselines away prior reports
    vals = np.random.RandomState(0).randn(257)
    ts.report("loss", vals[:100])
    ts.report("loss", vals[100:])
    ts.report("lr", 1e-4)
    c.update()
    assert c.num("loss") == 257
    np.testing.assert_allclose(c.mean("loss"), vals.mean(), rtol=1e-12)
    np.testing.assert_allclose(c.std("loss"), vals.std(), rtol=1e-9)
    assert c.num("lr") == 1 and c.std("lr") == 0.0
    assert c["lr"] == pytest.approx(1e-4)


def test_collector_windowing_and_keep_previous():
    c = ts.Collector()
    ts.report("x", [1.0, 3.0])
    c.update()
    assert c.mean("x") == 2.0
    # no new reports: keep_previous retains the old window
    c.update()
    assert c.mean("x") == 2.0 and c.num("x") == 2
    ts.report("x", [10.0])
    c.update()
    assert c.mean("x") == 10.0 and c.num("x") == 1


def test_collector_regex_and_empty():
    ts.report("a/loss", 1.0)
    ts.report("b/loss", 2.0)
    c = ts.Collector(regex="a/.*")
    c.update()
    assert c.names() == ["a/loss"]
    # empty report is legal (reference contract) and contributes nothing
    ts.report("a/empty", [])
    c.update()
    assert np.isnan(c.mean("a/empty"))


def test_in_graph_moments_match_host_report():
    c = ts.Collector()
    v = np.random.RandomState(1).randn(4, 5).astype(np.float32)
    m = jax.jit(ts.moments)(jnp.asarray(v))
    ts.report_moments("jit", m)
    ts.report("host", v)
    c.update()
    np.testing.assert_allclose(c.mean("jit"), c.mean("host"), rtol=1e-6)
    np.testing.assert_allclose(c.std("jit"), c.std("host"), rtol=1e-5)
    assert c.num("jit") == c.num("host") == 20


def test_report0_single_process():
    c = ts.Collector()
    ts.report0("r0", [5.0])
    c.update()
    assert c.num("r0") == 1  # process_index() == 0 here


# ---------------------------------------------------------------------------
# lm-eval harness scorer
# ---------------------------------------------------------------------------


def _tiny_scorer():
    from dimsum_tpu.eval.lm_harness import MambaScorer
    from dimsum_tpu.models.lm import MambaLMConfig, MambaLMHeadModel

    cfg = MambaLMConfig(d_model=32, n_layer=2, vocab_size=64,
                        pad_vocab_size_multiple=1)
    model = MambaLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))
    return MambaScorer(params, cfg, max_length=128), model, params


def test_loglikelihood_matches_manual():
    scorer, model, params = _tiny_scorer()
    prefix, cont = [1, 2, 3], [4, 5]
    ll, greedy = scorer.loglikelihood(prefix, cont)

    ids = prefix + cont
    logits = np.asarray(model.apply(params, jnp.asarray([ids]))[0],
                        np.float32)
    expect = 0.0
    for i, t in enumerate(cont):
        row = logits[len(prefix) - 1 + i]
        row = row - (np.log(np.exp(row - row.max()).sum()) + row.max())
        expect += row[t]
    np.testing.assert_allclose(ll, expect, rtol=1e-4)
    manual_greedy = all(
        logits[len(prefix) - 1 + i].argmax() == t
        for i, t in enumerate(cont))
    assert greedy == manual_greedy


def test_loglikelihood_rolling_consistent():
    scorer, _, _ = _tiny_scorer()
    toks = [3, 1, 4, 1, 5, 9]
    roll = scorer.loglikelihood_rolling(toks)
    ll, _ = scorer.loglikelihood(toks[:1], toks[1:])
    np.testing.assert_allclose(roll, ll, rtol=1e-6)


def test_greedy_until_generates_and_stops():
    scorer, _, _ = _tiny_scorer()
    out = scorer.greedy_until([1, 2, 3], max_new_tokens=6)
    assert len(out) == 6 and all(0 <= t < 64 for t in out)
    stop = out[2]
    first_hit = out.index(stop)  # greedy decode is deterministic
    stopped = scorer.greedy_until([1, 2, 3], max_new_tokens=6,
                                  stop_tokens=[stop])
    assert stopped == out[:first_hit]
