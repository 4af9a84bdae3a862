"""langevin_mcmc_tpu — a TPU-native gradient-based MCMC renderer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
luanfujun/Langevin-MCMC ("dpt": Langevin Monte Carlo Rendering with
Gradient-based Adaptation, SIGGRAPH 2020).

Design principles (TPU-first, not a port):
  * The path-contribution function is a pure JAX function of the
    primary-sample-space (PSS) vector; gradients and Hessians come from
    ``jax.grad`` / ``jax.jacfwd(jax.grad)`` instead of the reference's
    runtime C/ISPC codegen autodiff ("chad", reference src/chad.cpp).
  * Markov chains are vectorized: thousands of independent chains per chip
    advance in lockstep under ``jax.lax.scan`` / ``vmap`` and are sharded
    over a ``jax.sharding.Mesh`` for multi-chip scale-out.
  * Ray/triangle intersection replaces Embree (reference src/scene.cpp) with
    a flattened-BVH wavefront traversal evaluated on device.
  * Film splats replace AtomicFloat CAS adds (reference src/parallel.h) with
    scatter-adds per device + psum across the mesh.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry (ray-triangle matmuls, camera/quaternion transforms) needs real
# f32: the TPU default bf16 matmul precision loses ~8 mantissa bits and
# visibly breaks intersection tests. The renderer is HBM/latency-bound, not
# matmul-throughput-bound, so this costs little.
_jax.config.update('jax_default_matmul_precision', 'float32')

from .options import Options  # noqa: F401
