"""Boundary conditions.

Parity with ``/root/reference/lettuce/ext/_boundary/``: BounceBackBoundary,
EquilibriumBoundaryPU, AntiBounceBackOutlet, EquilibriumOutletP.

A boundary's ``__call__(flow)`` returns a full replacement field; the
Simulation composes it pointwise with
``where(no_collision_mask == index, replacement, f)`` — identical semantics
to the reference (``_simulation.py:177-189``). Everything is functional
(``f.at[...].set`` instead of in-place writes), so the operators trace under
``jax.jit`` and differentiate under ``jax.grad``.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..flow import Boundary, Flow

__all__ = ["BounceBackBoundary", "EquilibriumBoundaryPU",
           "AntiBounceBackOutlet", "EquilibriumOutletP", "SpongeOutlet",
           "PeriodicPressureBC", "combined_equilibrium_field"]


def combined_equilibrium_field(flow, boundaries, no_collision_mask):
    """Combine every *per-node* EquilibriumBoundaryPU into one replacement
    field selected by the index-coded mask.

    Returns ``(feq_field, pernode_indices)`` where ``feq_field`` is a host
    numpy array (None when no per-node boundary exists) — built on host
    once so it composes with any device sharding the caller chooses. Used
    by the fused Pallas kernel (as a blocked input) and by the sharded jnp
    path (as a shard_map operand cut to local shards) — per-node velocity
    fields are global-shaped, so they cannot be recomputed inside a local
    shard.
    """
    feq_field = None
    pernode = []
    for index, boundary in enumerate(boundaries[1:], start=1):
        if not isinstance(boundary, EquilibriumBoundaryPU):
            continue
        rho = flow.units.convert_pressure_pu_to_density_lu(boundary.pressure)
        if boundary.velocity.ndim <= 1 and np.asarray(rho).ndim == 0:
            continue  # uniform values stay compile-time constants
        u = flow.units.convert_velocity_to_lu(boundary.velocity)
        feq = np.asarray(flow.equilibrium(flow, rho=jnp.asarray(rho), u=u))
        full = np.broadcast_to(
            feq.reshape(feq.shape + (1,) * (flow.f.ndim - feq.ndim)),
            flow.f.shape)
        if feq_field is None:
            feq_field = np.zeros(flow.f.shape, dtype=feq.dtype)
        mask = np.asarray(no_collision_mask) == index
        feq_field = np.where(mask, full, feq_field)
        pernode.append(index)
    return feq_field, tuple(pernode)


class BounceBackBoundary(Boundary):
    """Full-way bounce back: f -> f[opposite] on masked solid nodes
    (reference ``bounce_back_boundary.py:10-32``)."""

    def __init__(self, mask):
        self._mask = mask

    def __call__(self, flow: "Flow") -> jax.Array:
        return flow.f[np.asarray(flow.stencil.opposite)]

    def make_no_streaming_mask(self, shape: List[int], context: "Context"
                               ) -> Optional[jax.Array]:
        return None

    def make_no_collision_mask(self, shape: List[int], context: "Context"
                               ) -> Optional[jax.Array]:
        return context.convert_to_tensor(self._mask, dtype=bool)

    def native_available(self) -> bool:
        return True



class EquilibriumBoundaryPU(Boundary):
    """Fix f to the equilibrium of a prescribed physical-units velocity and
    pressure (inflow / moving wall); reference
    ``equilibrium_boundary_pu.py:13-46``. Velocity/pressure may be scalars,
    ``[d]`` vectors, or per-node fields (broadcast-aware, as the reference's
    native path ``cuda_native/ext/_boundary/equilibrium_pu.py:16-97``)."""

    def __init__(self, context: "Context", mask, velocity, pressure=0):
        velocity = [velocity] if not hasattr(velocity, "__len__") \
            else velocity
        self.velocity = context.convert_to_tensor(
            np.asarray(velocity, dtype=np.float64))
        self.pressure = context.convert_to_tensor(
            np.asarray(pressure, dtype=np.float64))
        self._mask = mask

    def __call__(self, flow: "Flow") -> jax.Array:
        rho = flow.units.convert_pressure_pu_to_density_lu(self.pressure)
        u = flow.units.convert_velocity_to_lu(self.velocity)
        feq = flow.equilibrium(flow, rho, u)
        # broadcast to the full field shape
        return jnp.broadcast_to(
            feq.reshape(feq.shape + (1,) * (flow.f.ndim - feq.ndim)),
            flow.f.shape)

    def make_no_collision_mask(self, shape: List[int], context: "Context"
                               ) -> Optional[jax.Array]:
        return context.convert_to_tensor(self._mask, dtype=bool)

    def make_no_streaming_mask(self, shape: List[int], context: "Context"
                               ) -> Optional[jax.Array]:
        return None

    def native_available(self) -> bool:
        return True

    def window_view(self, axis: int, win_lo: int, width: int,
                    n: int) -> "EquilibriumBoundaryPU":
        """Copy valid on a contiguous periodic window of grid ``axis``
        (hybrid kernel fix-up): per-node velocity/pressure fields are
        re-sliced when they span that axis; uniform or broadcast
        (size-1) values pass through."""
        import copy as _copy

        def cut(value, lead):  # lead = extra leading dims before grid
            arr = jnp.asarray(value)
            dim = lead + axis
            if arr.ndim <= dim or arr.shape[dim] != n:
                return value
            idx = np.array([(win_lo + k) % n for k in range(width)])
            return jnp.take(arr, idx, axis=dim)

        clone = _copy.copy(self)
        clone.velocity = cut(self.velocity, 1)
        clone.pressure = cut(self.pressure, 1 if np.asarray(
            self.pressure).ndim > len(self._mask.shape) else 0)
        return clone



class AntiBounceBackOutlet(Boundary):
    """Open outlet via anti-bounce-back on one domain face (Krueger et al.
    2016, p.195; reference ``anti_bounce_back_outlet.py:13-109``).

    ``direction`` is a unit-ish list like ``[1, 0]`` / ``[0, 0, -1]``
    selecting the face. Wall velocity is linearly extrapolated from the
    neighbouring plane; the opposite incoming directions get a no-streaming
    mask so they are frozen before replacement.
    """

    def __init__(self, direction: List[int], flow: "Flow",
                 collision: "Collision" = None):
        # stored for reference API parity (anti_bounce_back_outlet.py:22-25
        # keeps a BGK default); the anti-bounce-back update itself never
        # evaluates it
        self.collision = collision
        assert len(direction) in [1, 2, 3], \
            (f"Invalid direction parameter. Expected direction of length "
             f"1, 2 or 3 but got {len(direction)}.")
        assert ((direction.count(0) == (len(direction) - 1))
                and ((1 in direction) ^ (-1 in direction))), \
            (f"Invalid direction parameter. Expected direction with all "
             f"entries 0 except one 1 or -1 but got {direction}.")

        self.stencil = flow.torch_stencil
        self.direction = list(direction)
        # face axis and its sign: nonzero component of the direction
        self.face_axis = int(np.flatnonzero(direction)[0])
        self.face_sign = int(direction[self.face_axis])

        e = np.asarray(flow.stencil.e)
        # velocities pointing out of the domain through this face
        self.velocities = np.where(e @ np.asarray(direction) > 1 - 1e-6)[0]

        # face/neighbour index tuples into the grid axes
        self.index = []
        self.neighbor = []
        for i in direction:
            if i == 0:
                self.index.append(slice(None))
                self.neighbor.append(slice(None))
            if i == 1:
                self.index.append(-1)
                self.neighbor.append(-2)
            if i == -1:
                self.index.append(0)
                self.neighbor.append(1)

        w = np.asarray(flow.stencil.w)[self.velocities]
        # weights broadcast over every grid axis (pointwise formulation)
        self.w = jnp.asarray(
            w.reshape((-1,) + (1,) * len(direction)),
            dtype=flow.context.dtype)

    def _u_neighbor(self, u: jax.Array) -> jax.Array:
        """Value of ``u`` at each node's inward neighbour along the face
        axis, as a full-field roll. On the face plane this equals the old
        global ``u[neighbor]`` slice; elsewhere the value is discarded by
        the ``no_collision_mask`` composition. Rolls are shard-local, so
        this form runs unchanged inside ``shard_map`` as long as the face
        axis itself is not sharded."""
        return jnp.roll(u, self.face_sign, axis=self.face_axis + 1)

    def __call__(self, flow: "Flow") -> jax.Array:
        u = flow.u()
        u_w = 1.5 * u - 0.5 * self._u_neighbor(u)  # extrapolated wall u

        e_sel = self.stencil.e[self.velocities]    # [k, d]
        eu = jnp.tensordot(e_sel, u_w, axes=1)     # [k, *res]
        unorm2 = jnp.sum(u_w * u_w, axis=0)        # [*res]
        cs = self.stencil.cs
        rho = flow.rho()                           # [1, *res]
        replacement = (-flow.f[self.velocities]
                       + self.w * rho
                       * (2 + eu ** 2 / cs ** 4 - unorm2 / cs ** 2))
        opposite = np.asarray(flow.stencil.opposite)[self.velocities]
        return flow.f.at[opposite].set(replacement)

    def make_no_streaming_mask(self, f_shape, context: "Context"):
        mask = np.zeros(tuple(f_shape), dtype=bool)
        opposite = np.asarray(
            context.convert_to_ndarray(self.stencil.opposite)
        )[self.velocities]
        mask[tuple([opposite] + self.index)] = True
        return context.convert_to_tensor(mask)

    def make_no_collision_mask(self, shape: List[int], context: "Context"):
        mask = np.zeros(tuple(shape), dtype=bool)
        mask[tuple(self.index)] = True
        return context.convert_to_tensor(mask)

    def native_available(self) -> bool:
        # runs WITH the fused kernel via the exact plane fix-up
        # (ops/pallas/hybrid_outlets.py) — the reference's native path
        # emits nothing for outlets, forcing the slow python step.
        # Exact type check: user subclasses may override __call__ with
        # physics the windowed fix-up does not replay; they must opt in
        # by appending to HYBRID_OUTLET_TYPES (shared with the kernel
        # gate, so both stay in sync).
        return type(self) in HYBRID_OUTLET_TYPES


class EquilibriumOutletP(AntiBounceBackOutlet):
    """Constant-pressure equilibrium outlet (reference
    ``equilibrium_outlet_p.py:12-91``): the face is set to
    feq(rho_outlet, u_neighbor); all non-outgoing directions get a
    no-streaming mask on the face."""

    def __init__(self, direction: List[int], flow: "Flow",
                 rho_outlet: float = 1.0):
        super().__init__(direction, flow)
        self.context = flow.context
        self.rho_outlet = flow.context.convert_to_tensor(rho_outlet)

    def __call__(self, flow: "Flow") -> jax.Array:
        rho = flow.rho()
        u = flow.u()
        rho_w = self.rho_outlet * jnp.ones_like(rho)
        u_w = self._u_neighbor(u)  # pointwise: neighbour's velocity
        return flow.equilibrium(flow, rho_w, u_w)

    def make_no_streaming_mask(self, shape: List[int], context: "Context"
                               ) -> Optional[jax.Array]:
        mask = np.zeros(tuple(shape), dtype=bool)
        complement = np.setdiff1d(np.arange(shape[0]), self.velocities)
        mask[tuple([complement] + self.index)] = True
        return context.convert_to_tensor(mask)

    def make_no_collision_mask(self, shape: List[int], context: "Context"):
        mask = np.zeros(tuple(shape), dtype=bool)
        mask[tuple(self.index)] = True
        return context.convert_to_tensor(mask)


class PeriodicPressureBC(Boundary):
    """Pressure-difference driving across a periodic axis.

    Promotes the reference's porous-medium notebook boundary
    (``/root/reference/examples/advanced_flows/PorousMedium.ipynb``,
    after Evati's high-performance porous-media scheme) to a first-class,
    stencil-generic component: populations entering through the low face
    of ``axis`` gain ``+w_q * delta_rho_lu`` and populations entering
    through the high face lose it, which imposes a body-force-free
    pressure drop ``delta_rho_lu * cs^2`` over the (periodic) domain
    length. The notebook hard-codes the D2Q9 direction indices and skips
    collision on the face nodes (its own TODO); here the face nodes
    collide normally and the jump is added on top, so the scheme reduces
    to plain periodic flow at ``delta_rho_lu = 0``.

    Pass the collision operator that drives the simulation — the face
    replacement is ``collision(flow) + jump``. Nodes in ``exclude_mask``
    (e.g. solid walls crossing the faces) are left to their own boundary:
    later-sorted boundaries win overlapping mask nodes, so without the
    exclusion this boundary would turn wall corners into driven fluid.
    """

    def __init__(self, flow: "Flow", delta_rho_lu: float,
                 collision: "Collision", axis: int = 0,
                 exclude_mask=None):
        self.collision = collision
        self.axis = int(axis)
        self.delta_rho_lu = float(delta_rho_lu)
        self.exclude_mask = (None if exclude_mask is None
                             else np.asarray(exclude_mask, dtype=bool))
        e = np.asarray(flow.stencil.e)
        w = np.asarray(flow.stencil.w)
        n = flow.resolution[self.axis]
        # jump[q, x]: +w_q drho on the low face for incoming (+axis)
        # populations, -w_q drho on the high face for (-axis) ones
        jump = np.zeros((flow.stencil.q, n))
        jump[e[:, self.axis] > 0, 0] = w[e[:, self.axis] > 0]
        jump[e[:, self.axis] < 0, -1] = -w[e[:, self.axis] < 0]
        shape = [flow.stencil.q] + [1] * len(flow.resolution)
        shape[self.axis + 1] = n
        self._jump = flow.context.convert_to_tensor(
            self.delta_rho_lu * jump.reshape(shape))

    def __call__(self, flow: "Flow") -> jax.Array:
        return self.collision(flow) + self._jump

    def make_no_collision_mask(self, shape: List[int], context: "Context"):
        mask = np.zeros(tuple(shape), dtype=bool)
        sel = [slice(None)] * len(shape)
        sel[self.axis] = 0
        mask[tuple(sel)] = True
        sel[self.axis] = -1
        mask[tuple(sel)] = True
        if self.exclude_mask is not None:
            mask &= ~self.exclude_mask
        return context.convert_to_tensor(mask)

    def make_no_streaming_mask(self, shape: List[int], context: "Context"
                               ) -> Optional[jax.Array]:
        return None


class SpongeOutlet(AntiBounceBackOutlet):
    """Anti-bounce-back outlet with an absorbing sponge layer.

    NEW capability (no reference counterpart): the reference's bare
    AntiBounceBackOutlet reflects startup acoustics and can diverge on
    impulsively-started flows (verified against the reference itself in
    round 1). This subclass keeps the same face update and additionally
    relaxes the ``depth`` planes upstream of the face toward
    feq(rho0, u_local) with a quadratically ramped strength — pressure
    waves entering the layer are damped instead of reflected, while the
    velocity field passes through.

    Pointwise (roll/ramp) formulation, so it shards exactly like the base
    outlet: keep the face axis unsharded.
    """

    def __init__(self, direction: List[int], flow: "Flow",
                 depth: int = 8, strength: float = 0.3, rho0: float = 1.0):
        super().__init__(direction, flow)
        self.depth = int(depth)
        self.strength = float(strength)
        self.rho0 = float(rho0)
        # quadratic ramp 0 -> strength over the sponge depth, and the
        # face selector, both as per-plane fields along the face axis
        # broadcast over the rest of the grid (this position data is what
        # window_view re-slices for the hybrid kernel fix-up)
        n = flow.resolution[self.face_axis]
        pos = np.arange(n, dtype=np.float64)
        dist = (n - 1 - pos) if self.face_sign == 1 else pos
        ramp = np.clip(1.0 - dist / max(1, self.depth), 0.0, 1.0) ** 2
        shape = [1] * len(flow.resolution)
        shape[self.face_axis] = n
        self._sigma = flow.context.convert_to_tensor(
            self.strength * ramp.reshape(shape))
        self._face_field = flow.context.convert_to_tensor(
            (dist == 0).reshape(shape))

    def __call__(self, flow: "Flow") -> jax.Array:
        # sponge blend everywhere (selected by the mask), plus the
        # anti-bounce-back update on the face itself
        rho_w = self.rho0 * jnp.ones_like(flow.rho())
        feq = flow.equilibrium(flow, rho_w, flow.u())
        sponged = flow.f + self._sigma * (feq - flow.f)
        abb = super().__call__(flow)
        # the face plane uses the ABB update; sponge planes use the blend
        return jnp.where(self._face_field, abb, sponged)

    def window_view(self, axis: int, win_lo: int, width: int,
                    n: int) -> "SpongeOutlet":
        """Shallow copy valid on a contiguous periodic window
        ``[win_lo, win_lo + width)`` of grid ``axis`` (hybrid kernel
        fix-up): the per-plane ramp and face selector are re-sliced to
        window-local coordinates when the window runs along the face
        axis (they broadcast over every other axis)."""
        import copy as _copy
        if axis != self.face_axis:
            return self
        idx = np.array([(win_lo + k) % n for k in range(width)])
        clone = _copy.copy(self)
        clone._sigma = jnp.take(self._sigma, idx, axis=self.face_axis)
        clone._face_field = jnp.take(self._face_field, idx,
                                     axis=self.face_axis)
        return clone

    def make_no_collision_mask(self, shape: List[int], context: "Context"):
        mask = np.zeros(tuple(shape), dtype=bool)
        n = shape[self.face_axis]
        sel = [slice(None)] * len(shape)
        if self.face_sign == 1:
            sel[self.face_axis] = slice(n - 1 - self.depth, n)
        else:
            sel[self.face_axis] = slice(0, self.depth + 1)
        mask[tuple(sel)] = True
        return context.convert_to_tensor(mask)


# Outlet types eligible for the fused-kernel hybrid fix-up
# (ops/pallas/hybrid_outlets.py). One shared tuple keeps
# ``native_available()`` and the kernel gate (``gate_fused_params``)
# consistent; subclasses opt in by appending here.
HYBRID_OUTLET_TYPES = (AntiBounceBackOutlet, EquilibriumOutletP,
                       SpongeOutlet)
