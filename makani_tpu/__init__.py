"""makani_tpu: TPU-native framework for ML weather/climate models.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of NVIDIA/makani:
spherical Fourier neural operators (SFNO), FourCastNet 1/3, ViT and Pangu on
ERA5-like data, with spatial/feature/ensemble/data parallelism expressed over
a single `jax.sharding.Mesh` instead of NCCL process groups.
"""

__version__ = "0.1.0"
