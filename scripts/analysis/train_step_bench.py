#!/usr/bin/env python
"""JSA training-step time with per-phase breakdown on the local chip.

Mirrors the reference's iter_stats runtime rows (runtime/retrieve,
runtime/forward, runtime/backward, runtime/model_update —
train.py:193-271, src/rag.py:1377-2180) for the framework's jitted step:

  batch  : retrieve_pair (sharded MIPS + union) + host tokenization
  grad   : jitted loss+grad (retriever scoring, MIS chain, generator CE)
  update : jitted optimizer apply

Model geometry is per --size (the step *structure* uses flagship counts:
mis_step 50, n_context 10; run-jsa-nq-no-rebuild.sh:45-50); the index is
filled with random unit rows on device so the bench needs no corpus embed.

Usage: python scripts/analysis/train_step_bench.py [--n 200000 --steps 8]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--size", type=str, default="base")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--mis", type=int, default=50)
    ap.add_argument("--n_context", type=int, default=10)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--text_maxlength", type=int, default=256)
    ap.add_argument("--flagship", action="store_true",
                    help="mirror the reference flagship training flags "
                         "(run-jsa-nq-no-rebuild.sh:10-67): large presets "
                         "(bge-large towers, ~1B GQA generator), LoRA, "
                         "query-side-only retriever, decoupled posterior, "
                         "bf16, remat, text 512 / target 256; combine with "
                         "--n 1300000 for the full flagship profile")
    ap.add_argument("--unfused", action="store_true",
                    help="also run the unfused grad/update diagnostic "
                         "phase (holds a full non-donated grads tree "
                         "alongside the params — OOMs the 16 GB chip at "
                         "flagship geometry, so --flagship skips it)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from jsa_rag_tpu.config import Options
    from jsa_rag_tpu.data.passages import PassageStore
    from jsa_rag_tpu.index.flat import ShardedFlatIndex
    from jsa_rag_tpu.model_io import load_or_initialize_model
    from jsa_rag_tpu.parallel.mesh import make_mesh
    from jsa_rag_tpu.train.optim import set_optim

    kw = {}
    if args.flagship:
        args.size = "large"
        args.text_maxlength = 512
        kw = dict(target_maxlength=256, use_lora=True,
                  query_side_retriever_training=True, decouple_encoder=True,
                  use_gradient_checkpoint_generator=True,
                  use_gradient_checkpoint_retriever=True,
                  precision="bf16", param_dtype="bfloat16",
                  temperature_jsa=0.1, weight_decay=0.01, dropout=0.1)
        # bf16 param storage is REQUIRED single-chip at this geometry:
        # f32 masters (7.6 GB placed) + Adam state (5.3 GB) + the 1.3M
        # fp16 index shard (2.5 GB) exceed the 16 GB v5e; multi-chip
        # deployments keep f32 masters and shard them (--shard_optim)
    opt = Options(
        model_size=args.size, gold_score_mode="jsa", gen_method="jsa",
        n_context=args.n_context, mis_step=args.mis,
        text_maxlength=args.text_maxlength,
        per_gpu_batch_size=args.batch, train_retriever=True,
        use_all_mis=True, unil_postandprior=True,
        **{"target_maxlength": 16, **kw},
    )
    t0 = time.time()
    store = PassageStore.synthetic(args.n, seed=0)
    model, params, _ = load_or_initialize_model(opt, store)
    mesh = make_mesh(n_data=1)
    dim = model.retriever.cfg.bert.hidden
    index = ShardedFlatIndex(mesh, len(store), dim)

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def random_rows(key, rows):
        e = jax.random.normal(key, (rows, dim), jnp.float32)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    # write through the index's own encoder (fp16 default stores raw bits;
    # a direct astype would corrupt the storage representation); chunked —
    # a single (1.3M, 1024) f32 source is 5.3 GB, which OOMs the 16 GB
    # chip next to the flagship model params
    chunk = 65536
    for ci, s in enumerate(range(0, len(store), chunk)):
        rows = min(chunk, len(store) - s)
        index.set_embeddings(
            s, random_rows(jax.random.fold_in(jax.random.PRNGKey(1), ci),
                           rows))
    print(f"# setup {time.time()-t0:.1f}s: {args.size} geometry, "
          f"n={args.n}, B={args.batch}, mis={args.mis}, "
          f"K={args.n_context}, L={args.text_maxlength}")

    rng0 = np.random.default_rng(0)
    def make_qt(step):
        qs = [f"what is w{rng0.integers(900)} q{step} b{i}"
              for i in range(args.batch)]
        ts = [f"w{rng0.integers(900)}" for _ in range(args.batch)]
        return qs, ts

    run_unfused = args.unfused or not args.flagship
    times = {"batch": [], "grad": [], "update": []}
    if run_unfused:
        vg = model.loss_and_grad_fn("jsa")
        tx, _ = set_optim(opt, params)
        opt_state = tx.init(params)

        @jax.jit
        def apply_update(params, opt_state, grads):
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        for step in range(args.steps + 2):
            qs, ts = make_qt(step)
            rng = jax.random.PRNGKey(step)
            t0 = time.time()
            batch = model.build_batch("jsa", index, params, qs, ts)
            jax.block_until_ready(batch["union_passage_ids"])
            t1 = time.time()
            (loss, aux), grads = vg(params, batch, rng)
            loss = float(loss)  # forces the full fwd+bwd
            t2 = time.time()
            params, opt_state = apply_update(params, opt_state, grads)
            jax.block_until_ready(
                jax.tree_util.tree_leaves(params)[0])
            t3 = time.time()
            if step >= 2:  # first 2 steps warm compiles
                times["batch"].append(t1 - t0)
                times["grad"].append(t2 - t1)
                times["update"].append(t3 - t2)
            assert np.isfinite(loss), loss
        del grads, opt_state, batch
        tot = sum(float(np.mean(v)) for v in times.values())
        for k, v in times.items():
            print(f"{k:7s}: {np.mean(v)*1e3:8.1f} ms "
                  f"(+/- {np.std(v)*1e3:.1f})")
        print(f"total  : {tot*1e3:8.1f} ms/step -> "
              f"{args.batch/tot:.2f} examples/sec/chip (loss {loss:.3f})")

    # ---- production fused step (what train.py actually runs): ONE jitted
    # loss+grad+update program, params/opt_state donated (in-place update,
    # no output-copy of frozen weights) — the A/B against grad+update above
    from jsa_rag_tpu.train.step import (host_batch_rows, init_opt_state,
                                        make_batch_placer, make_train_step,
                                        setup_params)

    params_p, specs = setup_params(opt, params, mesh)
    del params  # flagship geometry cannot hold two full copies + step
    tx2, _ = set_optim(opt, params_p)
    opt_state2 = init_opt_state(tx2, params_p, specs, mesh)
    fused = make_train_step(model.fns, "jsa", tx2, mesh)
    place = make_batch_placer(mesh)
    fused_times, batch_times = [], []
    for step in range(args.steps + 2):
        qs, ts = make_qt(1000 + step)
        tb = time.time()
        batch = place(model.build_batch("jsa", index, params_p, qs, ts))
        jax.block_until_ready(batch["union_passage_ids"])
        t0 = time.time()
        params_p, opt_state2, loss2, _aux = fused(
            params_p, opt_state2, batch, jax.random.PRNGKey(step))
        loss2 = float(loss2)
        if step >= 2:
            batch_times.append(t0 - tb)
            fused_times.append(time.time() - t0)
        assert np.isfinite(loss2), loss2
    # median, not mean: a union-shape bucket first seen mid-run triggers
    # one multi-minute flagship recompile (and tunnel stalls add outliers);
    # the per-step list is printed so outliers are visible, the median is
    # the steady-state step
    print("fused per-step (s): "
          + " ".join(f"{t:.2f}" for t in fused_times), flush=True)
    ft = float(np.median(fused_times))
    bt = float(np.median(batch_times))
    if run_unfused:
        gu = float(np.mean(times["grad"]) + np.mean(times["update"]))
        vs = f"[vs grad+update {gu*1e3:.1f} ms] "
    else:
        vs = ""
    print(f"batch  : {bt*1e3:8.1f} ms (+/- {np.std(batch_times)*1e3:.1f}) "
          "(retrieve_pair + union tokenize, production placer)")
    print(f"fused  : {ft*1e3:8.1f} ms/step "
          f"(+/- {np.std(fused_times)*1e3:.1f}) {vs}(loss {loss2:.3f})")
    print(f"step   : {(bt+ft)*1e3:8.1f} ms -> "
          f"{args.batch/(bt+ft):.2f} examples/sec/chip")


if __name__ == "__main__":
    main()
