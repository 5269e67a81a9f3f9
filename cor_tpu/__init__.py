"""cor_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for Composed Object
Retrieval, re-designed from scratch with the capabilities of the CORE model
(reference: wangtong627/COR).

The framework composes a SAM-style ViT query-image encoder, SigLIP image/text
towers, a trainable support branch (mask-conditioned pooling + gated
cross-modal fusion + projection) and a SAM-style two-way-transformer mask
decoder into one jitted graph, trains it data-parallel over a
``jax.sharding.Mesh``, and adds a sharded-gallery retrieval engine
(batched cosine scoring + distributed top-k over ICI) on top.

Layout
------
- ``cor_tpu.ops``        low-level functional ops (norms, attention, resize)
- ``cor_tpu.ops.pallas`` hand-written TPU Pallas kernels for the hot paths
- ``cor_tpu.models``     pure-functional model definitions (init/apply pairs)
- ``cor_tpu.parallel``   mesh construction + sharding rules
- ``cor_tpu.data``       CSV-manifest data pipeline, augmentations, tokenizer
- ``cor_tpu.train``      losses, metrics, optimizer, jitted steps, trainer
- ``cor_tpu.eval``       validators, prediction dumps, per-sample CSV metrics
- ``cor_tpu.retrieval``  sharded gallery index + top-k retrieval engine
- ``cor_tpu.cli``        train / eval / retrieve entry points
"""

__version__ = "0.1.0"
