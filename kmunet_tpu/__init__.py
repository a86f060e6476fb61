"""kmunet_tpu — a TPU-native (JAX/XLA/Pallas) nowcasting framework.

A from-scratch rebuild of the capabilities of the KM-UNet reference
(radar/cloud-mask precipitation nowcasting: KM_UNetV3 flagship + baseline
model zoo + metrics/training/eval stack), designed TPU-first:

- NHWC layouts, bf16-on-MXU compute, fp32 params.
- Convs/matmuls ride XLA:TPU; hot ops get Pallas kernels (see ``kernels/``).
- Parallelism is an explicit mesh/sharding layer (``parallel/``), not an
  afterthought: data-parallel, spatial ("context") parallel and FSDP-style
  parameter sharding over a ``jax.sharding.Mesh``.

Package map:
    ops/       functional numerics (B-spline basis, SSIM, bilinear sampling, DWT, scans)
    nn/        flax module library (KAN layers, HSM-SSD, IWP, DySample, DAGEM, ...)
    models/    model zoo (KM_UNetV3 SH/LAPS, SmaAt-UNet, ConvLSTM, TrajGRU, ...)
    losses/    HybridLoss + baseline rainfall losses
    metrics/   on-device CSI/POD/HSS/FAR/SSIM/PSNR evaluator
    data/      Shanghai HDF5 + LAPS readers, synthetic generators, host pipeline
    train/     train/eval engine, optimizers, checkpointing (orbax)
    parallel/  mesh construction, sharding rules, collective helpers
    kernels/   Pallas TPU kernels for the hot paths
    configs/   dataclass config system replacing the reference's script constants
"""

from kmunet_tpu.version import __version__

__all__ = ["__version__"]
