"""Forcing schemes: Guo and Shan-Chen.

Parity with ``/root/reference/lettuce/ext/_force/`` (``guo.py:7-42``,
``shan_chen.py:7-30``): a ``Force`` contributes a velocity shift ``u_eq``
(applied inside the collision's equilibrium velocity) and an additive source
term ``S_i``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp

from ..utils.utility import append_axes

__all__ = ["Force", "Guo", "ShanChen"]


class Force(ABC):
    @abstractmethod
    def source_term(self, u):
        ...

    @abstractmethod
    def u_eq(self, flow: "Flow"):
        ...

    @property
    @abstractmethod
    def ueq_scaling_factor(self):
        ...

    def native_available(self) -> bool:
        """True when this force can run inside the fused Pallas kernel:
        uniform (per-axis constant) acceleration only. The reference's
        native path supports no forcing at all
        (``cuda_native/ext/_force/_force.py``)."""
        import numpy as np
        accel = getattr(self, "acceleration", None)
        return accel is not None and np.asarray(accel).ndim == 1


class Guo(Force):
    """Guo forcing: S_i = (1 - 1/(2 tau)) w_i ((e_i - u)/cs^2
    + (e_i.u) e_i / cs^4) . a, with u_eq shift a/(2 rho)."""

    def __init__(self, flow: "Flow", tau, acceleration):
        self.flow = flow
        self.tau = tau
        self.acceleration = flow.context.convert_to_tensor(acceleration)

    def source_term(self, u) -> jax.Array:
        st = self.flow.torch_stencil
        d = st.d
        emu = append_axes(st.e, d) - u                      # [q, d, *res]
        eu = self.flow.einsum("ib,b->i", [st.e, u])         # [q, *res]
        eeu = self.flow.einsum("ia,i->ia", [st.e, eu])      # [q, d, *res]
        emu_eeu = emu / (st.cs ** 2) + eeu / (st.cs ** 4)
        emu_eeuF = self.flow.einsum("ia,a->i", [emu_eeu, self.acceleration])
        weemu_eeuF = append_axes(st.w, d) * emu_eeuF
        return (1 - 1 / (2 * self.tau)) * weemu_eeuF

    def u_eq(self, flow: "Flow" = None) -> jax.Array:
        flow = self.flow if flow is None else flow
        return (self.ueq_scaling_factor
                * append_axes(self.acceleration, flow.stencil.d)
                / flow.rho())

    @property
    def ueq_scaling_factor(self):
        return 0.5


class ShanChen(Force):
    """Shan-Chen velocity-shift forcing: u_eq = tau a / rho, no source
    term."""

    def __init__(self, flow: "Flow", tau, acceleration):
        self.flow = flow
        self.tau = tau
        self.acceleration = flow.context.convert_to_tensor(acceleration)

    def source_term(self, u):
        return 0

    def u_eq(self, flow: "Flow") -> jax.Array:
        return (self.ueq_scaling_factor
                * append_axes(self.acceleration, flow.stencil.d)
                / flow.rho())

    @property
    def ueq_scaling_factor(self):
        return self.tau * 1
