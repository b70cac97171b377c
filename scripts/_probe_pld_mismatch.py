"""Diagnose the PLD-vs-greedy mismatch seen at 224-token decodes.

Trains the bench_spec_realistic Part A tiny model (30 steps, seq 256),
runs plain greedy and PLD on the held-out prompts, and for every
mismatching row reports:
  * the first mismatch position and surrounding tokens from both paths;
  * an ORACLE recompute of the logits at that position (one full-prefix
    forward over greedy's tokens) — the top-2 logit margin says whether
    the disagreement is a genuine near-tie (ulp-level argmax flip
    between the 1-token decode pass and the 8-token verify pass) or a
    logic bug (a large-margin token that one path simply got wrong).
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import jax
import jax.numpy as jnp
import numpy as np

from bench_spec_realistic import VOCAB, EOS, _sample_report


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--draft-len", type=int, default=7)
    args = ap.parse_args()

    from hsenet_tpu.configs import Phi3Config, TrainConfig
    from hsenet_tpu.eval.generate import make_greedy_generate_llm_only
    from hsenet_tpu.eval.speculative import make_pld_generate_llm_only
    from hsenet_tpu.models.phi3 import Phi3ForCausalLM
    from hsenet_tpu.train.losses import masked_lm_loss
    from hsenet_tpu.train.train_state import TrainState, make_optimizer

    seq = args.seq
    cfg = Phi3Config(
        vocab_size=VOCAB, hidden_size=128, intermediate_size=256,
        num_layers=4, num_heads=4, num_kv_heads=2, head_dim=32,
        max_position_embeddings=2 * seq, tie_word_embeddings=True,
    )
    model = Phi3ForCausalLM(cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    n_lo, n_hi = max(5, seq // 20), max(9, seq // 9)

    def batch_of(n):
        ids = np.zeros((n, seq), np.int64)
        for i in range(n):
            r = _sample_report(rng, n_lo, n_hi)[:seq]
            ids[i, : len(r)] = r
        return ids

    train_ids = jnp.asarray(batch_of(64))
    labels = jnp.where(train_ids == 0, -100, train_ids)
    params = model.init(jax.random.PRNGKey(0), train_ids[:1])
    tx = make_optimizer(TrainConfig(total_steps=args.steps,
                                    learning_rate=2e-3, schedule="constant"))
    state = TrainState.create(params, tx)

    import optax

    @jax.jit
    def step(state, ids, labels):
        def loss_fn(p):
            logits, _ = model.apply(p, ids)
            return masked_lm_loss(logits, labels)

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state,
        ), loss

    for i in range(args.steps):
        state, loss = step(state, train_ids, labels)
    print(f"trained {args.steps} steps, loss {float(loss):.4f}", flush=True)

    eval_ids = batch_of(16)
    prompt_len, max_new = 24, seq - 32
    prompts = jnp.asarray(eval_ids[:, :prompt_len])
    kv = jnp.full((16,), prompt_len, jnp.int32)

    greedy = make_greedy_generate_llm_only(
        model, max_new_tokens=max_new, eos_token_id=EOS,
        cache_dtype=jnp.float32)
    ref = np.asarray(greedy(state.params, prompts, kv))
    pld = make_pld_generate_llm_only(
        model, max_new_tokens=max_new, eos_token_id=EOS,
        draft_len=args.draft_len, ngram=2, collect_stats=True,
        cache_dtype=jnp.float32)
    out, _, _ = pld(state.params, prompts, kv)
    out = np.asarray(out)

    # oracle: full-prefix forward over [prompt + greedy tokens]
    @jax.jit
    def oracle_logits(params, ids):
        logits, _ = model.apply(params, ids)
        return logits

    bad = [i for i in range(16) if (out[i] != ref[i]).any()]
    print(f"{len(bad)}/16 rows mismatch", flush=True)
    for i in bad[:6]:
        j = int(np.argmax(out[i] != ref[i]))
        full = np.concatenate([np.asarray(prompts[i]), ref[i]])
        logits = np.asarray(oracle_logits(
            state.params, jnp.asarray(full[None, :])))
        # logits at position prompt_len + j - 1 predict token j of the gen
        lg = logits[0, prompt_len + j - 1]
        top2 = np.argsort(lg)[-2:][::-1]
        print(
            f"row {i}: first mismatch at gen pos {j}/{max_new} "
            f"(greedy {ref[i, j]}, pld {out[i, j]}); "
            f"ctx ...{full[prompt_len + j - 5: prompt_len + j].tolist()} | "
            f"oracle top2 {top2.tolist()} "
            f"margin {lg[top2[0]] - lg[top2[1]]:.3e} "
            f"(logit[greedy]={lg[ref[i, j]]:.4f} "
            f"logit[pld]={lg[out[i, j]]:.4f}); "
            f"tail greedy {ref[i, j:j + 6].tolist()} "
            f"pld {out[i, j:j + 6].tolist()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
