"""neighborretr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-text retrieval framework.

A ground-up rebuild of the capabilities of zzezze/NeighborRetr (CVPR 2025,
"NeighborRetr: Balancing Hub Centrality in Cross-Modal Retrieval"):
a CLIP dual encoder fine-tuned with hubness-aware objectives — centrality-weighted
contrastive loss, memory-bank neighbor-adjusting loss, Sinkhorn optimal-transport
uniformity regularization, and a global↔local KL consistency loss — plus the full
retrieval evaluation harness (R@K / MdR / MnR, multi-sentence protocols) over
MSR-VTT / MSVD / DiDeMo / ActivityNet.

Design is TPU-first, not a port: pure-functional models over parameter pytrees,
bf16 compute with fp32 LayerNorm/softmax islands, static shapes throughout,
`jax.sharding.Mesh`-based data parallelism where the global similarity matrix is
row-sharded instead of redundantly replicated, and Pallas kernels for the
token-interaction similarity hot path.
"""

__version__ = "0.1.0"
