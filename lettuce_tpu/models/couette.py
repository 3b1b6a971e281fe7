"""Couette flow: shear between a moving top wall and a fixed bottom wall.

Parity with reference ``/root/reference/lettuce/ext/_flows/couette.py:16-76``
(moving ``EquilibriumBoundaryPU`` wall + ``BounceBackBoundary``), with two
deliberate fixes: the reference sets ``characteristic_velocity_pu = u0 = 0``
(division by zero in every velocity conversion) and places the moving wall at
grid column 1; here the characteristic velocity is the wall velocity (1.0)
and the walls sit on the actual domain faces, so the analytic linear profile
``u_x(y) = y * u_wall`` holds.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..ops.boundary import BounceBackBoundary, EquilibriumBoundaryPU
from ..unit import UnitConversion
from ._ext_flow import ExtFlow

__all__ = ["CouetteFlow2D"]


class CouetteFlow2D(ExtFlow):

    def __init__(self, context: "Context", resolution: Union[int, List[int]],
                 reynolds_number, mach_number,
                 stencil: Optional["Stencil"] = None,
                 equilibrium: Optional["Equilibrium"] = None):
        self.u0 = 0  # background velocity
        self.u_wall = 1.0
        super().__init__(context, resolution, reynolds_number, mach_number,
                         stencil, equilibrium)

    def make_resolution(self, resolution: Union[int, List[int]],
                        stencil: Optional["Stencil"] = None) -> List[int]:
        if isinstance(resolution, int):
            return [resolution] * 2
        return resolution

    def make_units(self, reynolds_number, mach_number,
                   resolution: List[int]) -> "UnitConversion":
        return UnitConversion(
            reynolds_number=reynolds_number,
            mach_number=mach_number,
            characteristic_length_lu=resolution[0],
            characteristic_length_pu=1,
            characteristic_velocity_pu=self.u_wall)

    def analytic_solution(self, t=0):
        x, y = self.grid
        u = jnp.stack([self.u_wall * y + self.u0, jnp.zeros_like(y)])
        p = jnp.zeros_like(y)[None, ...]
        return p, u

    def initial_pu(self):
        zeros = jnp.zeros(tuple(self.resolution), dtype=self.context.dtype)
        p = zeros[None, ...]
        u = jnp.stack([zeros, zeros], axis=0)
        return p, u

    @property
    def grid(self):
        xyz = tuple(jnp.linspace(0, 1, n, dtype=self.context.dtype)
                    for n in self.resolution)
        return jnp.meshgrid(*xyz, indexing="ij")

    @property
    def boundaries(self):
        ktop = np.zeros(tuple(self.resolution), dtype=bool)
        ktop[:, -1] = True
        kbottom = np.zeros(tuple(self.resolution), dtype=bool)
        kbottom[:, 0] = True
        return [
            # moving wall (top)
            EquilibriumBoundaryPU(self.context, mask=ktop,
                                  velocity=np.array([self.u_wall, 0.0])),
            # fixed wall (bottom)
            BounceBackBoundary(kbottom),
        ]
