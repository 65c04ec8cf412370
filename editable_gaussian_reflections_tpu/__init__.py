"""editable_gaussian_reflections_tpu - TPU-native differentiable ray tracer
for 3D Gaussian radiance fields with editable physically-based reflections.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
graphdeco-inria/editable-gaussian-reflections (SIGGRAPH Asia 2025): per-pixel
ray traversal through anisotropic Gaussians with depth-ordered alpha
compositing, GGX-importance-sampled reflection bounces, hand-written
loss-fused gradients, post-training scene editing, and pjit/shard_map
scaling across TPU meshes.
"""

__version__ = "0.1.0"
