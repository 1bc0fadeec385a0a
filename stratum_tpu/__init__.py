"""stratum_tpu — a TPU-native physically-based rendering framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the reference
C++/Vulkan renderer Stratum (scene graph -> flattened SoA device scene, LBVH ray
traversal, Disney BSDF path tracing with NEE/MIS, progressive accumulation,
denoising, tone mapping), designed TPU-first:

- geometry is flattened to world-space SoA arrays once per scene change
  (reference: src/Node/Scene.cpp:299-684 rebuilds GPU buffers + TLAS);
- the per-bounce render loop is a wavefront of SoA ray state advanced by
  ``lax.fori_loop`` (reference: megakernel ``while(beta>0)`` loop,
  src/Shaders/common/path.hlsli:954-1075);
- randomness is a counter-based pcg4d stream keyed by (pixel, seed, dim) so
  images are bit-identical regardless of device mesh layout
  (reference: src/Shaders/common/rng.hlsli:22-47);
- multi-chip scaling shards pixel-sample tiles over a ``jax.sharding.Mesh``
  with collectives only for final reductions.
"""

__version__ = "0.1.0"

from stratum_tpu.version import STRATUM_VERSION_MAJOR, STRATUM_VERSION_MINOR
