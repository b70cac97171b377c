"""hsenet-tpu: a TPU-native (JAX/XLA/Pallas) 3D medical vision-language framework.

Re-designed from scratch with the capabilities of YanzhaoShi/HSENet
(see SURVEY.md): dual-stage CLIP pretraining of 3D ViT encoders over chest-CT
volumes, slice-guided 2E3 encoding, spatial-packer projectors, and
Phi-4-mini-based report generation / VQA — all built on jax.sharding SPMD,
jit-compiled train steps, and Pallas flash-attention kernels.
"""

__version__ = "0.1.0"
