"""lm-evaluation-harness adapter for the Mamba LM stack.

Reference: `/root/reference/mamba/evals/lm_harness_eval.py` -- a thin
`HFLM` subclass registering `MambaLMHeadModel` as the "mamba" model for
`lm_eval`'s CLI.

The harness package is optional (not installed in zero-egress images), so
the scoring core is a standalone class:

  * `MambaScorer` -- jitted teacher-forced scoring on TPU:
    `loglikelihood(prefix, continuation)` returns the reference
    (logprob_sum, is_greedy) pair that every lm-eval task consumes, and
    `greedy_until` generates with the single-compiled-program decode loop
    (`models/lm.py::generate`).
  * `MambaEvalWrapper` -- the `lm_eval.api.model.LM` subclass wiring
    `MambaScorer` into the harness registry under the name "mamba"
    (import guarded; `python -m dimsum_tpu.eval.lm_harness` mirrors the
    reference's `cli_evaluate()` entry point when lm_eval is available).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from dimsum_tpu.models.lm import MambaLMConfig, MambaLMHeadModel, generate


class MambaScorer:
    """Teacher-forced log-likelihood scoring + greedy generation."""

    def __init__(self, params, cfg: MambaLMConfig, max_length: int = 2048):
        self.params = params
        self.cfg = cfg
        self.max_length = max_length
        self.model = MambaLMHeadModel(cfg)

        @jax.jit
        def _logits(params, ids):
            return self.model.apply(params, ids)

        self._logits = _logits

    @functools.lru_cache(maxsize=8)
    def _bucket(self, n: int) -> int:
        """Pad lengths to power-of-two buckets so the jit cache stays
        small (one compile per bucket, not per prompt length)."""
        b = 32
        while b < n:
            b *= 2
        return min(b, self.max_length)

    def loglikelihood(self, prefix: List[int],
                      continuation: List[int]) -> Tuple[float, bool]:
        """Sum of continuation-token logprobs under teacher forcing, and
        whether the continuation is the greedy decode (lm-eval's
        `loglikelihood` contract)."""
        ids = list(prefix) + list(continuation)
        ids = ids[-self.max_length:]
        n_cont = min(len(continuation), len(ids) - 1)
        L = self._bucket(len(ids))
        padded = np.zeros((1, L), np.int32)
        padded[0, :len(ids)] = ids
        logits = np.asarray(
            self._logits(self.params, jnp.asarray(padded))[0, :len(ids)],
            np.float32)
        # token t is predicted from position t-1
        tgt = np.asarray(ids[-n_cont:], np.int64)
        pred = logits[len(ids) - n_cont - 1:len(ids) - 1]
        logp = pred - jax.nn.logsumexp(pred, axis=-1, keepdims=True)
        token_logp = logp[np.arange(n_cont), tgt]
        greedy = bool((pred.argmax(-1) == tgt).all())
        return float(token_logp.sum()), greedy

    def loglikelihood_rolling(self, tokens: List[int]) -> float:
        """Full-sequence rolling loglikelihood (first token unscored)."""
        ll, _ = self.loglikelihood(tokens[:1], tokens[1:])
        return ll

    def greedy_until(self, prompt: List[int], max_new_tokens: int,
                     stop_tokens: Optional[List[int]] = None) -> List[int]:
        ids = jnp.asarray([prompt], jnp.int32)
        out = generate(self.params, self.cfg, ids, max_new_tokens,
                       rng=jax.random.PRNGKey(0), temperature=0.0)
        new = np.asarray(out)[0, len(prompt):].tolist()
        if stop_tokens:
            for i, t in enumerate(new):
                if t in stop_tokens:
                    return new[:i]
        return new


try:  # pragma: no cover - lm_eval is not installed in this image
    from lm_eval.api.model import LM
    from lm_eval.api.registry import register_model

    @register_model("mamba")
    class MambaEvalWrapper(LM):
        """lm-eval adapter (reference lm_harness_eval.py:11-38), backed by
        the JAX stack: checkpoints load through
        `dimsum_tpu.utils.hf.load_mamba_lm` and score on TPU."""

        def __init__(self, pretrained: str, max_length: int = 2048,
                     batch_size=None, device=None, dtype=None):
            super().__init__()
            from dimsum_tpu.utils.hf import load_hf_mamba

            cfg, params = load_hf_mamba(pretrained)
            self.scorer = MambaScorer(params, cfg, max_length=max_length)
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(
                "EleutherAI/gpt-neox-20b")
            self.tokenizer.pad_token_id = self.tokenizer.eos_token_id

        def loglikelihood(self, requests):
            out = []
            for req in requests:
                ctx, cont = req.args
                pre = self.tokenizer(ctx)["input_ids"]
                tgt = self.tokenizer(cont)["input_ids"]
                out.append(self.scorer.loglikelihood(pre, tgt))
            return out

        def loglikelihood_rolling(self, requests):
            return [
                self.scorer.loglikelihood_rolling(
                    self.tokenizer(req.args[0])["input_ids"])
                for req in requests
            ]

        def generate_until(self, requests):
            out = []
            for req in requests:
                ctx, kwargs = req.args
                ids = self.tokenizer(ctx)["input_ids"]
                until = kwargs.get("until", [])
                stop = [t for s in until
                        for t in self.tokenizer(s)["input_ids"][:1]]
                new = self.scorer.greedy_until(
                    ids, kwargs.get("max_gen_toks", 128), stop)
                out.append(self.tokenizer.decode(new))
            return out

    def cli_evaluate():  # mirror of the reference __main__
        from lm_eval.__main__ import cli_evaluate as _cli

        _cli()

except ImportError:
    MambaEvalWrapper = None

    def cli_evaluate():
        raise ImportError(
            "lm_eval is not installed; MambaScorer works standalone, the "
            "harness CLI needs `pip install lm-eval` on a networked machine")


if __name__ == "__main__":  # pragma: no cover
    cli_evaluate()
