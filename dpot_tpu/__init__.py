"""dpot_tpu — a TPU-native neural-operator pretraining framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of DPOT
("Auto-Regressive Denoising Operator Transformer", ICML'24, arXiv 2403.03542;
reference implementation HaoZhongkai/DPOT). The reference is a CUDA/PyTorch
script collection; this is a library designed TPU-first:

- channels-last (B, H, W, C) layouts throughout (no permute churn),
- the AFNO spectral mixer's complex block-MLP lowered to structured real
  matmuls that tile exactly onto the MXU (+ a fused Pallas kernel),
- functional models (flax.linen) with pure jitted train/eval steps,
- autoregressive rollout as `lax.scan`,
- data parallelism + spatial (Fourier-domain) sharding over a
  `jax.sharding.Mesh` instead of NCCL/DDP,
- orbax checkpointing with full train state (the reference drops scheduler
  state; we do not).
"""

__version__ = "0.1.0"
