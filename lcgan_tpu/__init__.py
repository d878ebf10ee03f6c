"""lcgan_tpu — a TPU-native JAX/Flax/Pallas framework with the capabilities of LC-GAN.

LC-GAN ("Linearly Controllable GAN", ECCV 2024) rebuilt from scratch for TPU:

  * NHWC layouts, bfloat16 compute with fp32 accumulation on the MXU
  * modulated convolutions via the algebraic input-scale / output-demodulate
    rewrite (one shared-weight conv per batch instead of groups=batch)
  * data parallelism via ``jax.sharding.Mesh`` + ``shard_map`` with XLA ICI
    collectives (``pmean``) instead of NCCL/DDP
  * functional train steps: EMA, freezeD masking, R1 as ``jax.grad``-in-grad
  * Orbax checkpoints carrying full train state (params, EMA, optimizer
    moments, w-avg, PRNG) — strictly more than the PyTorch reference saves

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
