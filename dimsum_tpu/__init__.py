"""DiMSUM-TPU: a TPU-native JAX/Pallas framework for hybrid Mamba-Transformer
latent flow-matching image generation.

This is a from-scratch TPU-first rebuild with the capabilities of
VinAIResearch/DiMSUM (NeurIPS'24): spatial-frequency hybrid Mamba diffusion
backbones, SiT-style transport (flow matching), ODE/SDE samplers, sharded
training and evaluation.

Layers (bottom-up):
  ops/        Pallas + XLA kernels (selective scan, causal conv, norms, DWT/DCT)
  models/     flax.linen model zoo (DiM, DiT) and blocks
  transport/  flow-matching paths, losses, integrators, samplers
  parallel/   mesh construction and sharded train/sample steps
  data/       latent-memmap and image-folder input pipelines
  eval/       FID/KID/IS/PR metric suite
  utils/      checkpointing (orbax + torch converter), logging
"""

__version__ = "0.1.0"
