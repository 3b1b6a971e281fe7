"""Collision operators.

Parity with ``/root/reference/lettuce/ext/_collision/``: BGK, NoCollision,
TRT, MRT (generic moment transform), Regularized (Latt-Chopard), KBC
(entropic, D2Q9/D3Q27), Smagorinsky LES.

All operators are pure ``flow -> f_post`` maps (no internal state mutation
beyond one-time constant caches built from *static* stencil metadata), so
they trace cleanly under ``jax.jit`` and differentiate under ``jax.grad``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import AnyStr, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..flow import Flow
from ..stencil import D2Q9, D3Q27

__all__ = ["Collision", "BGKCollision", "NoCollision", "TRTCollision",
           "MRTCollision", "RegularizedCollision", "KBCCollision",
           "KBCCollision2D", "KBCCollision3D", "SmagorinskyCollision",
           "CumulantCollision"]


class Collision(ABC):
    """Collision protocol (reference ``_simulation.py:16-27``)."""

    def __init_subclass__(cls, **kwargs):
        # record constructor args for HDF5 persistence / reconstruction
        # (LettuceDataset.make_collision; see utils/utility.py)
        super().__init_subclass__(**kwargs)
        from ..utils.utility import install_init_recorder
        install_init_recorder(cls)

    @abstractmethod
    def __call__(self, flow: "Flow") -> jax.Array:
        ...

    def native_available(self) -> bool:
        """True if this op can run inside the fused Pallas kernel."""
        return False


    def name(self) -> AnyStr:
        return self.__class__.__name__


def bgk_relax(f, feq, tau_inv):
    """f - 1/tau (f - feq) — shared by the jnp path and the Pallas kernel."""
    return f - tau_inv * (f - feq)


class BGKCollision(Collision):
    """Single-relaxation-time BGK, optional forcing scheme
    (reference ``bgk_collision.py:12-35``)."""

    def __init__(self, tau, force: Optional["Force"] = None):
        self.tau = tau
        self.force = force

    def __call__(self, flow: "Flow") -> jax.Array:
        u_eq = 0 if self.force is None else self.force.u_eq(flow)
        u = flow.u() + u_eq
        feq = flow.equilibrium(flow, u=u)
        si = self.force.source_term(u) if self.force is not None else 0
        return bgk_relax(flow.f, feq, 1.0 / self.tau) + si

    def name(self) -> AnyStr:
        if self.force is not None:
            return f"{self.__class__.__name__}_{self.force.__class__.__name__}"
        return self.__class__.__name__

    def native_available(self) -> bool:
        return self.force is None or self.force.native_available()



class NoCollision(Collision):
    """Identity collision, used for streaming-only tests
    (reference ``no_collision.py:9-17``)."""

    def __call__(self, flow: "Flow") -> jax.Array:
        return flow.f

    def native_available(self) -> bool:
        return True



class TRTCollision(Collision):
    """Two-relaxation-time collision (Krueger 2017; reference
    ``trt_collision.py:6-33``). Even/odd parts split via ``opposite``."""

    def __init__(self, tau, tau_minus=1.0):
        self.tau_plus = tau
        self.tau_minus = tau_minus

    def __call__(self, flow: "Flow") -> jax.Array:
        feq = flow.equilibrium(flow)
        opp = np.asarray(flow.stencil.opposite)
        f_opp = flow.f[opp]
        feq_opp = feq[opp]
        f_diff_neq = (((flow.f + f_opp) - (feq + feq_opp))
                      / (2.0 * self.tau_plus))
        f_diff_neq += (((flow.f - f_opp) - (feq - feq_opp))
                       / (2.0 * self.tau_minus))
        return flow.f - f_diff_neq

    def native_available(self) -> bool:
        return True


class MRTCollision(Collision):
    """Multi-relaxation-time collision in an arbitrary (possibly nonlinear)
    moment space given by a ``Transform`` (reference ``mrt_collision.py``)."""

    def __init__(self, transform: "Transform", relaxation_parameters,
                 context: "Context" = None):
        self.transform = transform
        if context is not None:
            self.relaxation_parameters = context.convert_to_tensor(
                relaxation_parameters)
        else:
            self.relaxation_parameters = jnp.asarray(relaxation_parameters)

    def __call__(self, flow: "Flow") -> jax.Array:
        m = self.transform.transform(flow.f)
        meq = self.transform.equilibrium(m, flow)
        # cast to the state dtype: under jax x64 a strongly-typed f64
        # parameter vector would silently promote f32 state to f64
        s_inv = (1 / self.relaxation_parameters).astype(m.dtype)
        m = m - s_inv.reshape((-1,) + (1,) * (m.ndim - 1)) * (m - meq)
        return self.transform.inverse_transform(m)

    def native_available(self) -> bool:
        # kernel fragment exists for the transforms with closed-form
        # equilibrium moments (d'Humieres computes them in-kernel as the
        # exact moment image of feq)
        from ..utils.moments import (D2Q9Dellar, D2Q9Lallemand,
                                     D3Q27Hermite, D3Q19DHumieres)
        return isinstance(self.transform,
                          (D2Q9Lallemand, D2Q9Dellar, D3Q27Hermite,
                           D3Q19DHumieres))


class CumulantCollision(MRTCollision):
    """Cumulant collision for D3Q27 (Geier et al. 2015): relax the
    cumulants of f toward their Maxwellian values. Completes the
    component the reference left as a commented-out draft
    (``/root/reference/lettuce/util/moments.py:276-366``).

    The three first-order slots carry the conserved momenta (identity
    relaxation); the six second-order cumulants relax with ``tau``
    (setting the shear viscosity exactly as BGK does); all higher-order
    cumulants relax to zero at rate ``tau_high`` (default 1 — the
    standard instantaneous-equilibration choice that gives the cumulant
    method its stability at under-resolved high Re). Runs on the jnp
    path (nonlinear per-node algebra; no kernel fragment — like the
    reference, whose native layer only covers BGK).
    """

    def __init__(self, stencil: "Stencil", tau: float,
                 context: "Context" = None, tau_high: float = 1.0):
        from ..utils.moments import D3Q27CumulantTransform, _CUM_IDXS
        transform = D3Q27CumulantTransform(stencil, context)
        taus = [float(tau) if sum(idx) == 2 else float(tau_high)
                for idx in _CUM_IDXS]
        for i, idx in enumerate(_CUM_IDXS):
            if sum(idx) <= 1:
                taus[i] = 1.0  # conserved slots: meq == m, rate moot
        super().__init__(transform, taus, context)
        self.tau = float(tau)

    def native_available(self) -> bool:
        return False


class RegularizedCollision(Collision):
    """Regularized LBM (Latt & Chopard 2006; reference
    ``regularized_collision.py:8-50``): project f_neq onto the Q tensor and
    relax only the first-order part."""

    def __init__(self, tau: float = None):
        self.tau = tau

    def __call__(self, flow: "Flow") -> jax.Array:
        tau = self.tau if self.tau is not None \
            else flow.units.relaxation_parameter_lu
        e = flow.torch_stencil.e  # [q, d]
        Q = (e[:, :, None] * e[:, None, :]
             - jnp.eye(flow.stencil.d, dtype=e.dtype) * flow.stencil.cs ** 2)

        feq = flow.equilibrium(flow)
        pi_neq = flow.shear_tensor(flow.f - feq)          # [d, d, *res]
        cs4 = flow.stencil.cs ** 4

        pi_neq = flow.einsum("qab,ab->q", [Q, pi_neq])    # [q, *res]
        w = flow.torch_stencil.w.reshape((-1,) + (1,) * flow.stencil.d)
        fi1 = w * pi_neq / (2 * cs4)
        return feq + (1.0 - 1.0 / tau) * fi1

    def native_available(self) -> bool:
        return True


class KBCCollision(Collision):
    """Entropic multi-relaxation (Karlin-Boesch-Chikatamarla) collision.

    D2Q9 and D3Q27 only, like the reference (``kbc_collision.py:11-181``).
    The data-dependent stabiliser gamma uses ``jnp.where`` for the
    small-denominator and NaN guards (reference ``:154-158``).
    """

    def __init__(self, tau: float = None):
        self.tau = tau
        self._cache = None  # (d, M) built lazily from static stencil tables

    def _moment_matrix(self, flow: "Flow"):
        if self._cache is not None:
            return self._cache
        d = flow.stencil.d
        e = np.asarray(flow.stencil.e, dtype=np.float64)
        if d == 3:
            if not isinstance(flow.stencil, D3Q27):
                raise AssertionError(
                    "KBC Collision is only implemented for D3Q27!")
            M = np.zeros([3, 3, 3, 27])
            for i in range(3):
                for j in range(3):
                    for k in range(3):
                        M[i, j, k] = (e[:, 0] ** i * e[:, 1] ** j
                                      * e[:, 2] ** k)
        elif d == 2:
            if not isinstance(flow.stencil, D2Q9):
                raise AssertionError(
                    "KBC Collision is only implemented for D2Q9!")
            M = np.zeros([3, 3, 9])
            for i in range(3):
                for j in range(3):
                    M[i, j] = e[:, 0] ** i * e[:, 1] ** j
        else:
            raise NotImplementedError(
                "KBC Collision is only implemented for 2d and 3d!")
        # cache the HOST table: a jnp constant created during one trace is
        # a tracer and must not leak into later traces
        self._cache = (d, M)
        return self._cache

    def _moment_transform(self, M, d, f):
        if d == 3:
            m = jnp.einsum("abcq,q...->abc...", M, f)
            rho = m[0, 0, 0]
            m = m / rho
            m = m.at[0, 0, 0].set(rho)
        else:
            m = jnp.einsum("abq,q...->ab...", M, f)
            rho = m[0, 0]
            m = m / rho
            m = m.at[0, 0].set(rho)
        return m

    @staticmethod
    def _s_seq_3d(f, m):
        T = m[2, 0, 0] + m[0, 2, 0] + m[0, 0, 2]
        N_xz = m[2, 0, 0] - m[0, 0, 2]
        N_yz = m[0, 2, 0] - m[0, 0, 2]
        Pi_xy = m[1, 1, 0]
        Pi_xz = m[1, 0, 1]
        Pi_yz = m[0, 1, 1]
        rho = m[0, 0, 0]

        s0 = rho * -T
        s1 = 1. / 6. * rho * (2 * N_xz - N_yz + T)
        s3 = 1. / 6. * rho * (2 * N_yz - N_xz + T)
        s5 = 1. / 6. * rho * (-N_xz - N_yz + T)
        s7 = 1. / 4. * rho * Pi_yz
        s11 = 1. / 4. * rho * Pi_xz
        s15 = 1. / 4. * rho * Pi_xy
        zero = jnp.zeros_like(s0)
        return jnp.stack([s0, s1, s1, s3, s3, s5, s5,
                          s7, s7, -s7, -s7, s11, s11, -s11, -s11,
                          s15, s15, -s15, -s15] + [zero] * 8)

    @staticmethod
    def _s_seq_2d(f, m):
        T = m[2, 0] + m[0, 2]
        N = m[2, 0] - m[0, 2]
        Pi_xy = m[1, 1]
        rho = m[0, 0]

        s0 = rho * -T
        s1 = 1. / 2. * rho * (0.5 * (T + N))
        s2 = 1. / 2. * rho * (0.5 * (T - N))
        s5 = 1. / 4. * rho * Pi_xy
        return jnp.stack([s0, s1, s2, s1, s2, s5, -s5, s5, -s5])

    def __call__(self, flow: "Flow") -> jax.Array:
        d, M_np = self._moment_matrix(flow)
        M = jnp.asarray(M_np, dtype=flow.context.dtype)
        tau = self.tau if self.tau is not None \
            else flow.units.relaxation_parameter_lu
        beta = 1.0 / (2 * tau)
        s_seq = self._s_seq_3d if d == 3 else self._s_seq_2d

        feq = flow.equilibrium(flow)

        m = self._moment_transform(M, d, flow.f)
        delta_s = s_seq(flow.f, m)
        m = self._moment_transform(M, d, feq)
        delta_s = delta_s - s_seq(flow.f, m)

        delta_h = flow.f - feq - delta_s
        sum_s = flow.rho(delta_s * delta_h / feq)
        sum_h = flow.rho(delta_h * delta_h / feq)

        # guard the denominator BEFORE dividing (not via an isnan-where
        # afterwards): grad-of-where still propagates NaN cotangents from
        # a poisoned branch, so an equilibrium cell (delta_h = 0, a 0/0)
        # would NaN every gradient flowing through a KBC rollout. Forward
        # values are unchanged: sum_h == 0 cells got gamma = 2.0 through
        # the old NaN guard too.
        degenerate = sum_h == 0
        ratio = sum_s / jnp.where(degenerate, 1.0, sum_h)
        gamma_stab = 1.0 / beta - (2 - 1.0 / beta) * ratio
        gamma_stab = jnp.where(degenerate, 2.0, gamma_stab)
        gamma_stab = jnp.where(gamma_stab < 1e-15, 2.0, gamma_stab)
        return flow.f - beta * (2 * delta_s + gamma_stab * delta_h)

    def native_available(self) -> bool:
        # the kernel fragment supports D2Q9/D3Q27 (checked at build time)
        return True


class KBCCollision2D(KBCCollision):
    def __init__(self, tau: float = None):
        import warnings
        warnings.warn("KBCCollision2D is deprecated! Use KBCCollision "
                      "instead!")
        super().__init__(tau)


class KBCCollision3D(KBCCollision):
    def __init__(self, tau: float = None):
        import warnings
        warnings.warn("KBCCollision3D is deprecated! Use KBCCollision "
                      "instead!")
        super().__init__(tau)


class SmagorinskyCollision(Collision):
    """Smagorinsky LES with BGK operator: effective tau from the local shear
    tensor by fixed-point iteration (2 iterations, like reference
    ``smagorinsky_collision.py:7-40``)."""

    def __init__(self, tau, smagorinsky_constant=0.17,
                 force: "Force" = None):
        self.force = force
        self.tau = tau
        self.iterations = 2
        self.constant = smagorinsky_constant

    def __call__(self, flow: "Flow") -> jax.Array:
        rho = flow.rho()
        u_eq = 0 if self.force is None else self.force.u_eq(flow)
        u = flow.u() + u_eq
        feq = flow.equilibrium(flow, rho, u)
        S_shear = flow.shear_tensor(flow.f - feq)
        S_shear = S_shear / (2.0 * rho * flow.stencil.cs ** 2)
        tau_eff = self.tau
        nu = (self.tau - 0.5) / 3.0

        for _ in range(self.iterations):
            S = S_shear / tau_eff
            S = jnp.sum(S * S, axis=(0, 1))
            nu_t = self.constant ** 2 * S
            nu_eff = nu + nu_t
            tau_eff = nu_eff * 3.0 + 0.5
        si = 0 if self.force is None else self.force.source_term(u)
        return flow.f - 1.0 / tau_eff * (flow.f - feq) + si

    def native_available(self) -> bool:
        return self.force is None
