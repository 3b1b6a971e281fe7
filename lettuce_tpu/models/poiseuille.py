"""Body-force-driven Poiseuille channel flow.

Parity with reference ``/root/reference/lettuce/ext/_flows/poiseuille.py``:
bounce-back walls at both y-faces, constant acceleration in x (consumed by a
``Guo``/``ShanChen`` force attached to the collision), analytic parabola.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..ops.boundary import BounceBackBoundary
from ..stencil import D2Q9
from ..unit import UnitConversion
from ._ext_flow import ExtFlow

__all__ = ["PoiseuilleFlow2D"]


class PoiseuilleFlow2D(ExtFlow):

    def __init__(self, context: "Context", resolution: Union[int, List[int]],
                 reynolds_number, mach_number,
                 stencil: Optional["Stencil"] = None,
                 equilibrium: Optional["Equilibrium"] = None,
                 initialize_with_zeros=True):
        self.stencil = D2Q9() if stencil is None else stencil
        self.initialize_with_zeros = initialize_with_zeros
        super().__init__(context, resolution, reynolds_number, mach_number,
                         self.stencil, equilibrium)

    def analytic_solution(self, t=0):
        half_lattice_spacing = 0.5 / self.resolution[0]
        x, y = self.grid
        nu = self.units.viscosity_pu
        rho = 1
        ux = (self.acceleration[0] / (2 * rho * nu)
              * ((y - half_lattice_spacing) * (1 - half_lattice_spacing - y)))
        uy = jnp.zeros(tuple(self.resolution), dtype=self.context.dtype)
        u = jnp.stack([ux, uy], axis=0)
        p = y * 0 + self.units.convert_density_lu_to_pressure_pu(rho)
        return p, u

    def initial_pu(self):
        if self.initialize_with_zeros:
            zeros = jnp.zeros(tuple(self.resolution),
                              dtype=self.context.dtype)
            p = zeros[None, ...]
            u = jnp.stack(2 * [zeros], axis=0)
            return p, u
        return self.analytic_solution()

    def make_units(self, reynolds_number, mach_number,
                   resolution: List[int]) -> "UnitConversion":
        return UnitConversion(
            reynolds_number=reynolds_number, mach_number=mach_number,
            characteristic_length_lu=resolution[0] - 1,
            characteristic_length_pu=1,
            characteristic_velocity_pu=1)

    def make_resolution(self, resolution: Union[int, List[int]],
                        stencil: Optional["Stencil"] = None) -> List[int]:
        if isinstance(resolution, list):
            assert len(resolution) == self.stencil.d
            return resolution
        return [resolution] * self.stencil.d

    @property
    def grid(self):
        xyz = tuple(jnp.linspace(0, 1, n, dtype=self.context.dtype)
                    for n in self.resolution)
        return jnp.meshgrid(*xyz, indexing="ij")

    @property
    def boundaries(self):
        mask = np.zeros(tuple(self.resolution), dtype=bool)
        mask[:, [0, -1]] = True
        return [BounceBackBoundary(mask=mask)]

    @property
    def acceleration(self):
        return self.context.convert_to_tensor([0.001, 0])
