"""Speculative decoding: prompt-lookup (n-gram) drafting + batched verify.

Beyond-reference capability (the reference decodes strictly one token per
forward). Drafts come from matching the trailing n-gram of the generated
context against earlier context (HF's prompt_lookup_num_tokens idea) — no
draft model, no extra weights, ideal for summarization/code/chat where the
output repeats spans of the prompt.

Verification is ONE forward of width k+1 through the existing stepper
program: greedy targets t_i = argmax(logits[:, i]); drafts accept while
d_{i+1} == t_i. Output is bit-identical to sequential greedy decode.

Rollback costs nothing with the contiguous KV cache: `kv_len` gates both
the attention mask (key_pos < kv_len + T) and the next write offset, so
rejected positions are masked out and overwritten by the next step's
writes. One compiled program (width k+1) serves every step; a step yields
1..k+1 tokens.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

from moe_infinity_tpu.runtime.generate import eos_hit, GenerationResult, _bucket_len


def ngram_draft(
    context: np.ndarray, k: int, max_ngram: int = 3, min_ngram: int = 1
) -> Optional[np.ndarray]:
    """Propose the k tokens that followed the most recent earlier occurrence
    of the longest matching trailing n-gram. None if no match."""
    n_ctx = len(context)
    for n in range(min(max_ngram, n_ctx - 1), min_ngram - 1, -1):
        tail = context[n_ctx - n :]
        # search latest earlier occurrence (exclude the trailing one)
        for start in range(n_ctx - n - 1, -1, -1):
            if np.array_equal(context[start : start + n], tail):
                cont = context[start + n : start + n + k]
                if len(cont) > 0:
                    if len(cont) < k:  # pad by repeating the last token
                        cont = np.concatenate(
                            [cont, np.full(k - len(cont), cont[-1])]
                        )
                    return cont.astype(np.int64)
        # fall through to a shorter n-gram
    return None


class SpeculativeDecoder:
    """Greedy decode with n-gram speculation over any stepper (batch 1)."""

    def __init__(
        self,
        stepper,
        *,
        spec_tokens: int = 4,
        max_ngram: int = 3,
        max_seq_len: int = 2048,
    ):
        self.stepper = stepper
        self.k = int(spec_tokens)
        self.max_ngram = max_ngram
        self.max_seq_len = max_seq_len

    def generate(
        self,
        input_ids: np.ndarray,
        max_new_tokens: int = 32,
        *,
        eos_token_id: Optional[int] = None,
        pad_token_id: int = 0,
        **_ignored,
    ) -> GenerationResult:
        input_ids = np.asarray(input_ids)
        if input_ids.ndim == 1:
            input_ids = input_ids[None]
        if input_ids.shape[0] != 1:
            raise ValueError("speculative decoding supports batch size 1")
        T = input_ids.shape[1]
        cap = min(self.max_seq_len, _bucket_len(T + max_new_tokens + self.k + 1))
        if T + max_new_tokens + self.k + 1 > cap:
            raise ValueError("prompt + new tokens exceed capacity")
        kv = self.stepper.init_cache(1, cap)
        seq_ids = self.stepper.begin_sequences(1)

        # ---- prefill ----------------------------------------------------
        tokens = jnp.asarray(input_ids, jnp.int32)
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (1, T))
        logits, kv, _ = self.stepper.forward(
            tokens, positions, kv, jnp.int32(0), seq_ids=seq_ids
        )
        first = int(np.asarray(jnp.argmax(logits[0, -1, :])))

        context = list(input_ids[0]) + [first]
        generated = [first]
        accepted_hist = []
        cur = T + 1  # tokens whose K/V is final
        done = eos_token_id is not None and bool(eos_hit(first, eos_token_id))
        while not done and len(generated) < max_new_tokens:
            draft = ngram_draft(
                np.asarray(context), self.k, self.max_ngram
            )
            if draft is None:
                draft = np.full(self.k, context[-1], dtype=np.int64)
            # feed [last_accepted, d1..dk] at columns cur-1..cur+k-1
            step_toks = np.concatenate([[context[-1]], draft])[None]
            pos = np.arange(cur - 1, cur + self.k, dtype=np.int32)[None]
            logits, kv, _ = self.stepper.forward(
                jnp.asarray(step_toks, jnp.int32), jnp.asarray(pos), kv,
                jnp.int32(cur - 1), seq_ids=seq_ids,
            )
            targets = np.asarray(jnp.argmax(logits[0], axis=-1))  # [k+1]
            # accept drafts while they match the model's own greedy choice
            n_acc = 0
            while n_acc < self.k and draft[n_acc] == targets[n_acc]:
                n_acc += 1
            new_tokens = list(targets[: n_acc + 1])  # accepted + 1 corrected
            accepted_hist.append(n_acc)
            for t in new_tokens:
                if len(generated) >= max_new_tokens:
                    break
                generated.append(int(t))
                context.append(int(t))
                if eos_token_id is not None and eos_hit(t, eos_token_id):
                    done = True
                    break
            # K/V is valid through the last *input* column that produced an
            # accepted target: inputs were context[-1], d1..d_{n_acc}
            cur += n_acc + 1

        self.stepper.end_sequences(seq_ids)
        out = np.concatenate(
            [input_ids[0], np.asarray(generated, dtype=np.int64)]
        )[None]
        return GenerationResult(
            sequences=out,
            num_generated=np.asarray([len(generated)]),
            stats={
                "spec_steps": len(accepted_hist),
                "spec_accepted": int(np.sum(accepted_hist)) if accepted_hist else 0,
                "spec_accept_rate": (
                    float(np.mean(accepted_hist)) / self.k
                    if accepted_hist
                    else 0.0
                ),
            },
        )
