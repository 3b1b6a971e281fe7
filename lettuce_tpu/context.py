"""Device/dtype configuration for lettuce-tpu.

TPU-native analog of the reference's ``Context`` (see
``/root/reference/lettuce/_context.py:9-107``): instead of binding a single
``torch.device``, a :class:`Context` resolves a JAX platform + default dtype
and decides whether the fused Pallas kernel path ("native") may be used.

Unlike the reference, ``use_native`` does not trigger runtime C++/CUDA code
generation — the Pallas kernel is traced and compiled by XLA, and the XLA
compilation cache plays the role of the reference's ``lettuce_native_<hash>``
module cache (``cuda_native/_generator.py:213-264``).
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Context"]

_FLOAT_DTYPES = ("float16", "bfloat16", "float32", "float64")


def _enable_x64() -> None:
    jax.config.update("jax_enable_x64", True)


class Context:
    """Resolves platform, default float dtype, and the native-kernel flag.

    Parameters
    ----------
    device:
        ``None`` (auto: first available device), a platform string
        (``"tpu"``, ``"cpu"``, ``"gpu"``), or a :class:`jax.Device`.
    dtype:
        Default floating dtype for simulation state. ``float64`` transparently
        enables JAX x64 mode (slow on TPU; meant for correctness runs,
        mirroring the reference's ``--precision double``).
    use_native:
        Allow the fused Pallas stream-collide kernel when every component of a
        simulation supports it. Unlike the reference (native => CUDA only),
        the Pallas kernel can also run in interpreter mode on CPU, so no
        device restriction is asserted.
    """

    def __init__(self, device: Union[None, str, jax.Device] = None,
                 dtype: Any = jnp.float32, use_native: bool = True):
        dtype = jnp.dtype(dtype)
        assert dtype.name in _FLOAT_DTYPES, \
            f"dtype must be one of {_FLOAT_DTYPES}, got {dtype.name}"
        if dtype == jnp.dtype("float64"):
            _enable_x64()

        # arrays are COMMITTED to self.device only when the user pinned
        # one explicitly (the reference's `-i/--gpu-id` semantics);
        # otherwise factories return uncommitted arrays, so the same
        # Context composes with multi-device meshes (committed
        # single-device constants inside a shard_mapped closure raise
        # "incompatible devices" under jax.vjp)
        self.device_pinned = device is not None
        if device is None:
            self.device = jax.devices()[0]
        elif isinstance(device, str):
            name = device.lower()
            if name.startswith("cuda"):  # convenience for ported scripts
                name = "gpu"
            self.device = jax.devices(name)[0]
        else:
            self.device = device

        self.dtype = dtype
        self.use_native = use_native

    def _put(self, array: jax.Array) -> jax.Array:
        if isinstance(array, jax.core.Tracer):
            return array  # placement is the enclosing jit's concern
        return (jax.device_put(array, self.device) if self.device_pinned
                else array)

    @property
    def platform(self) -> str:
        return self.device.platform

    # ------------------------------------------------------------------
    # tensor factories (API parity with reference _context.py:64-107)
    # ------------------------------------------------------------------
    def empty_tensor(self, size: Sequence[int], dtype=None) -> jax.Array:
        # JAX has no uninitialised alloc; zeros is equivalent and safe.
        return self.zero_tensor(size, dtype=dtype)

    def zero_tensor(self, size: Sequence[int], dtype=None) -> jax.Array:
        return self._put(jnp.zeros(tuple(size), dtype=self._resolve(dtype)))

    def one_tensor(self, size: Sequence[int], dtype=None) -> jax.Array:
        return self._put(jnp.ones(tuple(size), dtype=self._resolve(dtype)))

    def convert_to_tensor(self, array, dtype=None) -> jax.Array:
        """Convert to a device array.

        Bool and integer inputs keep their dtype (mask semantics, mirroring
        reference ``_context.py:83-103``); floats are cast to the context
        dtype unless an explicit dtype is given.
        """
        if isinstance(array, (jax.Array, jax.core.Tracer)):
            # already on device (or being traced): never round-trip
            # through numpy — np.asarray would fetch the buffer to host
            # (expensive over remote runtimes) and breaks under jit
            if dtype is None:
                dtype = (array.dtype if array.dtype.kind in "biu"
                         else self.dtype)
            else:
                dtype = self._resolve(dtype)
            return self._put(jnp.asarray(array, dtype=dtype))
        if dtype is None:
            a = np.asarray(array)
            if a.dtype.kind in "biu":  # bool / int / uint pass through
                dtype = a.dtype
            else:
                dtype = self.dtype
            return self._put(jnp.asarray(a, dtype=dtype))
        return self._put(jnp.asarray(array, dtype=self._resolve(dtype)))

    @staticmethod
    def convert_to_ndarray(tensor) -> np.ndarray:
        return np.asarray(tensor)

    def _resolve(self, dtype):
        return self.dtype if dtype is None else dtype

    def __repr__(self) -> str:
        return (f"Context(device={self.device}, dtype={self.dtype.name}, "
                f"use_native={self.use_native})")
