"""Flow: physical configuration + simulation state, and its observables.

Parity with the reference ``Flow`` ABC (``/root/reference/lettuce/_flow.py:54-236``)
including the ``Equilibrium`` and ``Boundary`` protocols
(``_flow.py:16-51``) and the equilibrium / pressure-Poisson / f_neq
initialisation helpers (``_flow.py:239-336``).

TPU-first design: a ``Flow`` object is a *configuration holder* plus the
current state arrays ``f`` (shape ``[q, *resolution]``) and step counter
``i``. All observables are pure functions of ``(config, f)`` — no method
mutates state — so the whole object can be closed over by ``jax.jit``: the
``Simulation`` traces a step function in which ``flow.view(f_tracer)``
substitutes the traced state. Gradients flow through every observable and
through full rollouts via ``jax.grad`` (the JAX analog of the reference's
implicit torch autograd).
"""

from __future__ import annotations

import copy
import pickle
from abc import ABC, abstractmethod
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .stencil import JaxStencil, Stencil
from .unit import UnitConversion
from .utils.utility import jax_gradient, jax_jacobi

__all__ = ["Equilibrium", "Flow", "Boundary"]


class Equilibrium(ABC):
    @abstractmethod
    def __call__(self, flow: "Flow", rho=None, u=None) -> jax.Array:
        ...

    def native_available(self) -> bool:
        """True if this equilibrium can run inside the fused Pallas kernel."""
        return False



class Boundary(ABC):
    """Boundary protocol (reference ``_flow.py:30-51``).

    ``__call__`` returns a full-field replacement for ``f``; the Simulation
    applies it where ``no_collision_mask == boundary_index``. The two mask
    constructors return a node mask (-> no collision) and a per-(q, node)
    mask (-> no streaming), or ``None``.
    """

    @abstractmethod
    def __call__(self, flow: "Flow") -> jax.Array:
        ...

    @abstractmethod
    def make_no_collision_mask(self, shape: List[int], context: "Context"
                               ) -> Optional[jax.Array]:
        ...

    @abstractmethod
    def make_no_streaming_mask(self, shape: List[int], context: "Context"
                               ) -> Optional[jax.Array]:
        ...

    def native_available(self) -> bool:
        return False



class Flow(ABC):
    """Physical configuration and state of a simulation."""

    def __init_subclass__(cls, **kwargs):
        """Record constructor arguments (``_init_record``) so
        ``HDF5Reporter`` can persist HOW a flow was built and
        ``LettuceDataset.make_flow`` can rebuild it from file (the
        reference pickles the live flow instead,
        ``/root/reference/lettuce/util/datautils.py:112-133``)."""
        super().__init_subclass__(**kwargs)
        from .utils.utility import install_init_recorder
        install_init_recorder(cls)

    def __init__(self, context: "Context", resolution: List[int],
                 units: "UnitConversion", stencil: "Stencil",
                 equilibrium: "Equilibrium"):
        self.context = context
        self.resolution = list(resolution)
        self.units = units
        self.stencil = stencil
        self.torch_stencil = JaxStencil(stencil, context)  # parity alias
        self.equilibrium = equilibrium

        self.i = 0
        self.f = context.zero_tensor([stencil.q, *resolution])

        self.initialize()

    # convenience alias: 'torch_stencil' kept for reference-API parity
    @property
    def jax_stencil(self) -> JaxStencil:
        return self.torch_stencil

    # ------------------------------------------------------------------
    # tracing support
    # ------------------------------------------------------------------
    def view(self, f: jax.Array, i=None) -> "Flow":
        """Shallow copy with the state array replaced — used to run the
        observable/collision/boundary machinery on a traced ``f`` inside
        ``jax.jit`` without mutating the concrete flow object."""
        v = copy.copy(self)
        v.f = f
        if i is not None:
            v.i = i
        return v

    # ------------------------------------------------------------------
    # abstract configuration
    # ------------------------------------------------------------------
    @property
    @abstractmethod
    def boundaries(self) -> List["Boundary"]:
        return []

    @abstractmethod
    def initial_pu(self):
        """Initial (p, u) in physical units."""
        ...

    # optional flags, same defaults as reference (_flow.py:71-72)
    initialize_pressure: bool = False
    initialize_fneq: bool = False

    def initialize(self):
        """Initialise ``f`` at equilibrium from ``initial_pu`` (reference
        ``_flow.py:106-122``); optional pressure-Poisson refinement and
        non-equilibrium (f^neq) initialisation.

        The whole computation is staged as ONE jitted program: eager
        per-op dispatch dominates construction on remote runtimes
        (measured 362 s for TGV 256^3 D3Q27 over the axon tunnel vs
        ~4 s staged). Host-side ICs (numpy RNG / FFT fields) run once at
        trace time and enter the program as constants; a non-traceable
        user ``initial_pu`` falls back to the eager path."""
        if self._stage_initialize():
            try:
                f = jax.jit(self._initial_f)()
            except (jax.errors.TracerArrayConversionError,
                    jax.errors.ConcretizationTypeError,
                    jax.errors.TracerBoolConversionError,
                    jax.errors.TracerIntegerConversionError):
                f = self._initial_f()
        else:
            f = self._initial_f()
        self.f = f

    def _stage_initialize(self) -> bool:
        """Stage unless this is a small grid on plain CPU, where per-flow
        compile time outweighs the dispatch savings (test suites build
        thousands of tiny flows)."""
        if self.context.platform != "cpu":
            return True
        return int(np.prod(self.resolution)) >= (1 << 18)

    def _initial_f(self) -> jax.Array:
        """The initialization compute (traceable for standard flows)."""
        initial_p, initial_u = self.initial_pu()
        rho = self.context.convert_to_tensor(
            self.units.convert_pressure_pu_to_density_lu(
                self.context.convert_to_tensor(initial_p)))
        u = self.context.convert_to_tensor(
            self.units.convert_velocity_to_lu(
                self.context.convert_to_tensor(initial_u)))
        if self.initialize_pressure:
            rho = pressure_poisson(self.units, u, rho)
        f = self.equilibrium(self, rho=rho, u=u)
        if self.initialize_fneq:
            f = initialize_f_neq(self.view(f))
        return f

    # ------------------------------------------------------------------
    # observables (pure in f)
    # ------------------------------------------------------------------
    def rho(self, f: Optional[jax.Array] = None) -> jax.Array:
        """Density, shape [1, *resolution]."""
        return jnp.sum(self.f if f is None else f, axis=0, keepdims=True)

    @property
    def rho_pu(self) -> jax.Array:
        return self.units.convert_density_to_pu(self.rho())

    @property
    def p_pu(self) -> jax.Array:
        return self.units.convert_density_lu_to_pressure_pu(self.rho())

    @property
    def u_pu(self) -> jax.Array:
        return self.units.convert_velocity_to_pu(self.u())

    def j(self, f: Optional[jax.Array] = None) -> jax.Array:
        """Momentum, shape [d, *resolution].

        precision=HIGHEST keeps the moment contraction in true f32/f64 on
        TPU (the default would route it through bf16 MXU passes)."""
        return jnp.tensordot(self.torch_stencil.e.T,
                             self.f if f is None else f, axes=1,
                             precision=jax.lax.Precision.HIGHEST)

    def u(self, f: Optional[jax.Array] = None, rho=None, acceleration=None
          ) -> jax.Array:
        """Velocity [d, *resolution]; with a forcing scheme, ``acceleration``
        adds the Guo half-step correction a/(2 rho)."""
        rho = self.rho(f=f) if rho is None else rho
        v = self.j(f=f) / rho
        if acceleration is None:
            return v
        acceleration = jnp.asarray(acceleration)
        if acceleration.ndim == 1:
            acceleration = acceleration.reshape(
                acceleration.shape + (1,) * self.stencil.d)
        return v + acceleration / (2 * rho)

    @property
    def velocity(self) -> jax.Array:
        return self.j() / self.rho()

    def incompressible_energy(self, f: Optional[jax.Array] = None
                              ) -> jax.Array:
        """Pointwise incompressible kinetic energy 0.5 |u|^2."""
        u = self.u(f)
        return 0.5 * jnp.sum(u * u, axis=0)

    def entropy(self) -> jax.Array:
        """Pointwise H-theorem entropy -sum_q f log(f/w), shape [*res]."""
        w = self.torch_stencil.w.reshape((-1,) + (1,) * self.stencil.d)
        f_log = -jnp.log(self.f / w)
        return jnp.sum(self.f * f_log, axis=0)

    def pseudo_entropy_global(self) -> jax.Array:
        w = self.torch_stencil.w.reshape((-1,) + (1,) * self.stencil.d)
        f_w = self.f / w
        return self.rho() - jnp.sum(self.f * f_w, axis=0)

    def pseudo_entropy_local(self, f: Optional[jax.Array] = None
                             ) -> jax.Array:
        f = self.f if f is None else f
        f_feq = f / self.equilibrium(self)
        return self.rho(f) - jnp.sum(f * f_feq, axis=0)

    def shear_tensor(self, f: Optional[jax.Array] = None) -> jax.Array:
        """Pi_ab = sum_q f_q e_qa e_qb, shape [d, d, *resolution]."""
        e = self.torch_stencil.e  # [q, d]
        ee = e[:, :, None] * e[:, None, :]  # [q, d, d]
        return jnp.tensordot(ee.T, self.f if f is None else f,
                             axes=([2], [0]),
                             precision=jax.lax.Precision.HIGHEST)

    def einsum(self, equation, fields, *args) -> jax.Array:
        """Shape-polymorphic Einstein summation (reference
        ``_flow.py:210-224``): trailing grid axes are auto-appended."""
        inputs, output = equation.split("->")
        inputs = inputs.split(",")
        for idx, inp in enumerate(inputs):
            if len(inp) == fields[idx].ndim:
                pass
            elif len(inp) == fields[idx].ndim - self.stencil.d:
                inputs[idx] += "..."
                if not output.endswith("..."):
                    output += "..."
            else:
                raise AssertionError("Bad dimension.")
        equation = ",".join(inputs) + "->" + output
        return jnp.einsum(equation, *fields, *args)

    # ------------------------------------------------------------------
    # checkpointing (reference _flow.py:226-236 saved f only; we also keep
    # the step counter so resume is exact)
    # ------------------------------------------------------------------
    def dump(self, filename):
        with open(filename, "wb") as file:
            pickle.dump({"f": self.context.convert_to_ndarray(self.f),
                         "i": self.i}, file)

    def load(self, filename):
        with open(filename, "rb") as file:
            payload = pickle.load(file)
        if isinstance(payload, dict):
            self.f = self.context.convert_to_tensor(
                payload["f"], dtype=self.context.dtype)
            self.i = int(payload.get("i", 0))
        else:  # raw-array dumps from the reference format
            self.f = self.context.convert_to_tensor(
                payload, dtype=self.context.dtype)


# ----------------------------------------------------------------------
# initialisation helpers (reference _flow.py:239-336)
# ----------------------------------------------------------------------
def pressure_poisson(units: "UnitConversion", u, rho0, tol_abs=1e-10,
                     max_num_steps=100000):
    """Solve the pressure Poisson equation with a Jacobi scheme (2D).

    Same algorithm as reference ``_flow.py:239-288``: rhs = -d_i d_j (u_i u_j)
    via periodic FD gradients, then Jacobi iteration to convergence.
    """
    dx = units.convert_length_to_pu(1.0)
    u = units.convert_velocity_to_pu(u)
    p = units.convert_density_lu_to_pressure_pu(rho0)

    dim = u.shape[0]
    u_mod = jnp.zeros_like(u[0])
    for i in range(dim):
        for j in range(dim):
            derivative = jax_gradient(
                jax_gradient(u[i] * u[j], dx)[i], dx)[j]
            u_mod = u_mod - derivative

    p_mod = jax_jacobi(u_mod, p[0], dx, dim=dim, tol_abs=tol_abs,
                       max_num_steps=max_num_steps)[None, ...]

    return units.convert_pressure_pu_to_density_lu(p_mod)


def initialize_pressure_poisson(flow: "Flow", max_num_steps=100000,
                                tol_pressure=1e-6):
    """Re-equilibrate with Jacobi-solved pressure (call before
    ``initialize_f_neq``)."""
    u = flow.u()
    rho = pressure_poisson(flow.units, u, flow.rho(), tol_abs=tol_pressure,
                           max_num_steps=max_num_steps)
    return flow.equilibrium(flow, rho=rho, u=u)


def initialize_f_neq(flow: "Flow"):
    """Add first-order (f^1) contributions approximated by 6th-order finite
    differences of the strain rate (Krueger et al. 2017); reference
    ``_flow.py:309-336``."""
    rho = flow.rho()
    u = flow.u()

    grads = [jax_gradient(u[i], dx=1, order=6)[None, ...]
             for i in range(flow.stencil.d)]
    S = jnp.concatenate(grads)  # [d, d, *res]

    Pi_1 = (flow.units.relaxation_parameter_lu * rho * S
            / flow.torch_stencil.cs ** 2)
    e = flow.torch_stencil.e
    Q = (e[:, :, None] * e[:, None, :]
         - jnp.eye(flow.stencil.d, dtype=e.dtype) * flow.stencil.cs ** 2)
    Pi_1_Q = flow.einsum("ab,iab->i", [Pi_1, Q])
    w = flow.torch_stencil.w.reshape((-1,) + (1,) * flow.stencil.d)
    fneq = w * Pi_1_Q

    feq = flow.equilibrium(flow, rho, u)
    return feq - fneq
