"""jsa_rag_tpu — a TPU-native retrieval-augmented-generation framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of JSA-RAG
(joint retriever+generator training with an in-training-loop retrieval index):

- ``ops``      — Pallas/XLA kernels: fused MIPS (matmul + k-select), top-k merge.
- ``index``    — HBM-resident sharded passage index (flat exact + IVF), save/load.
- ``models``   — JAX encoder (BERT/bge-style) and decoder-only LM, LoRA overlay.
- ``parallel`` — device mesh, sharding specs, collectives, multi-host bootstrap.
- ``train``    — training modes (concat / rag / vrag / jsa-MIS), optim, loop.
- ``tasks``    — dataset/task abstraction (qa, lm, mlm, fever, kilt, ...).
- ``data``     — tokenization & prompt construction, passage stores.
- ``utils``    — metrics (EM/F1/Rouge/BLEU/recall), schedulers, stats, logging.

The retrieval index lives as a sharded ``jax.Array`` in HBM and is queried by a
fused Pallas dot-product + k-select kernel with a cross-chip top-k merge over
ICI — replacing the reference's FAISS-GPU index behind HTTP/gRPC servers
(reference: src/index.py, build_server/server_start.py).
"""

__version__ = "0.1.0"
