"""Plane Couette flow: fluid sheared between a sliding lid and a fixed
plate.

Case-equivalent to the reference's ``couette.py:16-76``, with two
deliberate fixes carried over from round 1 (both verified against the
analytic profile): the characteristic velocity is the WALL velocity — the
reference uses its zero background velocity, which breaks every velocity
conversion with a division by zero — and the moving wall sits on the
actual y=1 face rather than grid column 1, so the steady state is the
exact linear profile ``u_x(y) = u_wall * y``.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..ops.boundary import BounceBackBoundary, EquilibriumBoundaryPU
from ..unit import UnitConversion
from ._ext_flow import ExtFlow, closed_grid, expand_resolution, face_mask

__all__ = ["CouetteFlow2D"]


class CouetteFlow2D(ExtFlow):
    """Wall-bounded shear: y=0 is a bounce-back plate, y=1 an equilibrium
    wall moving at ``u_wall`` in x. Starts from rest."""

    u_wall = 1.0
    u0 = 0  # background velocity

    def __init__(self, context: "Context", resolution: Union[int, List[int]],
                 reynolds_number, mach_number,
                 stencil: Optional["Stencil"] = None,
                 equilibrium: Optional["Equilibrium"] = None):
        super().__init__(context, resolution, reynolds_number, mach_number,
                         stencil, equilibrium)

    @property
    def grid(self):
        return closed_grid(self.resolution, 1.0, self.context.dtype)

    @property
    def boundaries(self):
        return [
            EquilibriumBoundaryPU(
                self.context, mask=face_mask(self.resolution, axis=1, end=-1),
                velocity=np.array([self.u_wall, 0.0])),
            BounceBackBoundary(face_mask(self.resolution, axis=1, end=0)),
        ]

    def initial_pu(self):
        rest = jnp.zeros(tuple(self.resolution), dtype=self.context.dtype)
        return rest[None], jnp.stack([rest, rest])

    def analytic_solution(self, t=0):
        """Steady state: linear shear profile, uniform pressure."""
        y = self.grid[1]
        u = jnp.stack([self.u_wall * y + self.u0, jnp.zeros_like(y)])
        return jnp.zeros_like(y)[None], u

    def make_resolution(self, resolution: Union[int, List[int]],
                        stencil: Optional["Stencil"] = None) -> List[int]:
        return expand_resolution(resolution, 2)

    def make_units(self, reynolds_number, mach_number,
                   resolution: List[int]) -> "UnitConversion":
        return UnitConversion(reynolds_number, mach_number,
                              characteristic_length_lu=resolution[0],
                              characteristic_length_pu=1,
                              characteristic_velocity_pu=self.u_wall)
