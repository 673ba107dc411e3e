"""NDJIR-TPU: TPU-native joint inverse rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of sony/NDJIR
(Neural Direct and Joint Inverse Rendering, arXiv 2302.00675): neural-SDF
volumetric ray marching with hierarchical importance sampling, multi-
resolution grid feature encodings, and a physically-based shading integrator
(base color, roughness, specular reflectance, environment light, soft
visibility, implicit illumination, photogrammetric camera light), trained
per-scene from posed multi-view images, with mesh + material extraction.

Unlike the reference (nnabla + ~12k LoC of hand-written CUDA), every op here
is natively twice-differentiable JAX, the full training step (point sampling
included) lives inside one jitted/shard_mapped program, and rays shard across
TPU meshes via jax.sharding.
"""

__version__ = "0.1.0"

from ndjir_tpu.config import Config, load_config  # noqa: F401
