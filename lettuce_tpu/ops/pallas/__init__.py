"""Fused Pallas stream-collide kernels (the TPU-native replacement for the
reference's runtime CUDA codegen, ``/root/reference/lettuce/cuda_native/``).

``build_fused_step(simulation)`` returns a one-step function ``f -> f`` or
raises ``NotImplementedError`` when the configuration is not supported by
the fused kernel yet (the Simulation then falls back to the jnp path, like
the reference falls back to its Python step, ``_simulation.py:100-115``).
"""

from .stream_collide import build_fused_step, build_fused_multi_step  # noqa: F401
