#!/usr/bin/env python
"""Autoregressive decode throughput (the eval harness's hot path).

The reference's generation eval decodes max_new_tokens=256 per example with
HF ``generate`` (evaluate.py:251, greedy; src/rag.py:2247-2258 beam). This
measures the framework's jitted KV-cache decode (``greedy_generate`` /
``beam_generate``) in tokens/sec/chip at a llama-family geometry, prompt
lengths matching the concat-10-passages eval prompt.

Usage: python scripts/analysis/decode_bench.py [--layers 16 --hidden 2048]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _chained_time(fn, params, ids, mask, iters: int = 4) -> float:
    """Per-call seconds via chained data-dependent iterations (the axon
    tunnel makes per-call block_until_ready unreliable — see bench.py);
    the ~26 ms fixed host-fetch overhead is subtracted once and the
    result floored at a microsecond so short early-exit decodes can't
    print negative times."""
    import jax.numpy as jnp

    t0 = time.time()
    carry = jnp.zeros((), jnp.int32)
    for _ in range(iters):
        out = fn(params, input_ids=ids + carry * 0, attention_mask=mask)
        carry = carry + out[0, 0] * 0
    np.asarray(carry)
    return max((time.time() - t0 - 0.026) / iters, 1e-6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--kv_heads", type=int, default=8)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--new", type=int, default=256)
    ap.add_argument("--batches", type=str, default="1,8,32")
    ap.add_argument("--beams", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from jsa_rag_tpu.models.lm import (LMConfig, lm_init, greedy_generate,
                                       beam_generate)

    cfg = LMConfig(
        vocab_size=args.vocab, hidden=args.hidden, layers=args.layers,
        heads=args.hidden // 128,
        kv_heads=min(args.kv_heads, args.hidden // 128),
        intermediate=int(3.5 * args.hidden), dtype=jnp.bfloat16,
    )
    params = jax.device_put(lm_init(jax.random.PRNGKey(0), cfg))
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    print(f"# {args.layers}x{args.hidden} (kv={args.kv_heads}) "
          f"= {n_params/1e9:.2f}B params, prompt={args.prompt} "
          f"new={args.new}")

    greedy = jax.jit(partial(
        greedy_generate, cfg=cfg, max_new_tokens=args.new, eos_id=2,
        pad_id=0))
    beam = jax.jit(partial(
        beam_generate, cfg=cfg, max_new_tokens=args.new, eos_id=2,
        pad_id=0, num_beams=args.beams, length_penalty=1.1))

    for b in [int(x) for x in args.batches.split(",")]:
        ids = jnp.full((b, args.prompt), 7, jnp.int32)
        mask = jnp.ones((b, args.prompt), jnp.int32)
        for name, fn in [("greedy", greedy), (f"beam{args.beams}", beam)]:
            try:
                out = fn(params, input_ids=ids, attention_mask=mask)
                np.asarray(out)  # warm
                dt = _chained_time(fn, params, ids, mask)
                tps = b * args.new / dt
                print(f"B={b:3d} {name:7s}: {dt*1e3:8.1f} ms "
                      f"({dt*1e3/args.new:6.2f} ms/tok) -> "
                      f"{tps:8.0f} tok/s/chip")
            except Exception as e:
                print(f"B={b:3d} {name:7s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
        # early-exit arm: EOS = the token this model emits most often, so
        # every row finishes within a few steps — the short-answer QA
        # regime. Measures the decode while_loop's data-dependent exit
        # (same program; a fixed-length scan would still pay all
        # max_new_tokens forwards).
        try:
            sample = np.asarray(greedy(params, input_ids=ids,
                                       attention_mask=mask))
            vals, counts = np.unique(sample[sample != 0],
                                     return_counts=True)
            eos_fast = int(vals[np.argmax(counts)])
            greedy_fast = jax.jit(partial(
                greedy_generate, cfg=cfg, max_new_tokens=args.new,
                eos_id=eos_fast, pad_id=0))
            out = greedy_fast(params, input_ids=ids, attention_mask=mask)
            emitted = float((np.asarray(out) != 0).sum(-1).mean())
            dt = _chained_time(greedy_fast, params, ids, mask)
            print(f"B={b:3d} greedy-earlyexit: {dt*1e3:8.1f} ms "
                  f"(avg {emitted:.1f} emitted of {args.new} budget)")
        except Exception as e:
            print(f"B={b:3d} greedy-earlyexit: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
