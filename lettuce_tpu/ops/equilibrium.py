"""Equilibrium distributions.

Parity with ``/root/reference/lettuce/ext/_equilibrium/``:
``QuadraticEquilibrium`` (``quadratic_equilibrium.py:10-31``),
``QuadraticEquilibriumLessMemory`` and
``IncompressibleQuadraticEquilibrium``.

Each op has exactly ONE implementation — a pure jnp function on raw arrays —
which serves both the reference step path and the fused Pallas kernel
(``native_fragment``). This collapses the reference's dual python-op/CUDA-
emitter design (``cuda_native/ext/_equilibrium/quadratic_equilibrium.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..flow import Equilibrium, Flow

__all__ = ["QuadraticEquilibrium", "QuadraticEquilibriumLessMemory",
           "IncompressibleQuadraticEquilibrium"]


def quadratic_feq(e: jax.Array, w: jax.Array, cs: float, rho, u) -> jax.Array:
    """f_eq = w_q rho (1 + e.u/cs^2 + (e.u)^2/(2 cs^4) - u^2/(2 cs^2)).

    ``e``: [q, d]; ``u``: [d, ...]; ``rho``: broadcastable to [...].
    Returns [q, ...]. Written as in the reference to match floating-point
    association:  w * rho * ((2 exu - uxu)/(2 cs^2) + 0.5 (exu/cs^2)^2 + 1).
    precision=HIGHEST keeps the e.u contraction out of bf16 MXU passes.
    """
    exu = jnp.tensordot(e, u, axes=1,
                        precision=jax.lax.Precision.HIGHEST)  # [q, ...]
    uxu = jnp.sum(u * u, axis=0)                    # [...]
    inner = rho * ((2 * exu - uxu) / (2 * cs ** 2)
                   + 0.5 * (exu / cs ** 2) ** 2 + 1)
    return w.reshape((-1,) + (1,) * (inner.ndim - 1)) * inner


def incompressible_feq(e, w, cs, rho, u, rho0) -> jax.Array:
    """He-Luo incompressible form with constant rho0 prefactor on the
    velocity terms (reference ``incompressible_quadratic_equilibrium.py``)."""
    exu = jnp.tensordot(e, u, axes=1,
                        precision=jax.lax.Precision.HIGHEST)
    uxu = jnp.sum(u * u, axis=0)
    inner = rho + rho0 * ((2 * exu - uxu) / (2 * cs ** 2)
                          + 0.5 * (exu / cs ** 2) ** 2)
    return w.reshape((-1,) + (1,) * (inner.ndim - 1)) * inner


class QuadraticEquilibrium(Equilibrium):
    def __call__(self, flow: "Flow", rho=None, u=None) -> jax.Array:
        rho = flow.rho() if rho is None else rho
        u = flow.u() if u is None else u
        return quadratic_feq(flow.torch_stencil.e, flow.torch_stencil.w,
                             flow.torch_stencil.cs, rho, u)

    def native_available(self) -> bool:
        return True



class QuadraticEquilibriumLessMemory(QuadraticEquilibrium):
    """Same math as :class:`QuadraticEquilibrium`, materialising no
    ``[q, ...]`` intermediate: feq is built one q at a time inside a Python
    loop and stacked at the end, mirroring the reference variant's
    trade-20%-RAM-for-2%-speed strategy
    (``quadratic_equilibrium_less_memory.py:9-34``). Under ``jit`` XLA
    usually fuses both forms to the same HLO; unjitted (eager debugging on
    large grids) this variant's peak memory is ~q x lower.
    """

    def __call__(self, flow: "Flow", rho=None, u=None) -> jax.Array:
        rho = flow.rho() if rho is None else rho
        u = flow.u() if u is None else u
        e = flow.torch_stencil.e
        w = flow.torch_stencil.w
        cs2 = float(flow.torch_stencil.cs) ** 2
        rho = jnp.asarray(rho)
        if rho.ndim == u.ndim:  # [1, *res] convention -> per-q scalar field
            rho = rho[0]
        uxu = jnp.sum(u * u, axis=0)
        rows = []
        for qi in range(e.shape[0]):
            exu = jnp.tensordot(e[qi], u, axes=1,
                                precision=jax.lax.Precision.HIGHEST)
            rows.append(float(w[qi]) * rho
                        * ((2 * exu - uxu) / (2 * cs2)
                           + 0.5 * (exu / cs2) ** 2 + 1))
        return jnp.stack(rows)

    def native_available(self) -> bool:
        return False


class IncompressibleQuadraticEquilibrium(Equilibrium):
    def __init__(self, rho0=1.0):
        self.rho0 = rho0

    def __call__(self, flow: "Flow", rho=None, u=None) -> jax.Array:
        rho = flow.rho() if rho is None else rho
        u = flow.u() if u is None else u
        return incompressible_feq(flow.torch_stencil.e, flow.torch_stencil.w,
                                  flow.torch_stencil.cs, rho, u, self.rho0)
