"""Taylor-Green vortex in 2D and 3D.

Parity with reference ``/root/reference/lettuce/ext/_flows/taylorgreen.py``:
periodic vortex decay with the exact 2D analytic solution; ``initialize_fneq``
defaults to True.
"""

from __future__ import annotations

import warnings
from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..stencil import D2Q9
from ..unit import UnitConversion
from ._ext_flow import ExtFlow

__all__ = ["TaylorGreenVortex", "TaylorGreenVortex2D", "TaylorGreenVortex3D"]


class TaylorGreenVortex(ExtFlow):
    def __init__(self, context: "Context", resolution: Union[int, List[int]],
                 reynolds_number, mach_number,
                 stencil: Optional["Stencil"] = None,
                 equilibrium: Optional["Equilibrium"] = None,
                 initialize_fneq: bool = True):
        self.initialize_fneq = initialize_fneq
        if stencil is None and not isinstance(resolution, list):
            warnings.warn("Requiring information about dimensionality! "
                          "Either via stencil or resolution. Setting "
                          "dimension to 2.", UserWarning)
            self.stencil = D2Q9()
        else:
            self.stencil = stencil() if callable(stencil) else stencil
        ExtFlow.__init__(self, context, resolution, reynolds_number,
                         mach_number, stencil, equilibrium)

    def make_resolution(self, resolution: Union[int, List[int]],
                        stencil: Optional["Stencil"] = None) -> List[int]:
        if isinstance(resolution, int):
            return [resolution] * self.stencil.d
        assert len(resolution) in [2, 3], \
            "the resolution of a taylor-green-vortex must be 2- or 3-dim!"
        return resolution

    def make_units(self, reynolds_number, mach_number,
                   resolution) -> "UnitConversion":
        return UnitConversion(
            reynolds_number=reynolds_number,
            mach_number=mach_number,
            characteristic_length_lu=resolution[0],
            characteristic_length_pu=2 * np.pi,
            characteristic_velocity_pu=1)

    @property
    def grid(self):
        xyz = tuple(
            jnp.linspace(0, 2 * np.pi * (1 - 1 / n), n,
                         dtype=self.context.dtype)
            for n in self.resolution)
        return jnp.meshgrid(*xyz, indexing="ij")

    def initial_pu(self):
        return self.analytic_solution(t=0)

    def analytic_solution(self, t: float = 0):
        # traceable in t (2D): the guard must not branch on a traced value
        if self.stencil.d > 2 and not isinstance(t, jnp.ndarray) and t > 0:
            warnings.warn("The analytic solution is only true for the "
                          "2D TGV!")
        grid = self.grid
        nu = self.units.viscosity_pu
        if len(self.resolution) == 2:
            decay = jnp.exp(jnp.asarray(-2 * nu * t, self.context.dtype))
            u = jnp.stack([jnp.cos(grid[0]) * jnp.sin(grid[1]) * decay,
                           -jnp.sin(grid[0]) * jnp.cos(grid[1]) * decay])
            p = -jnp.stack(
                [0.25 * (jnp.cos(2 * grid[0]) + jnp.cos(2 * grid[1]))
                 * decay ** 2])
        else:
            u = jnp.stack([
                jnp.sin(grid[0]) * jnp.cos(grid[1]) * jnp.cos(grid[2]),
                -jnp.cos(grid[0]) * jnp.sin(grid[1]) * jnp.cos(grid[2]),
                jnp.zeros_like(grid[0])])
            p = jnp.stack(
                [1 / 16. * (jnp.cos(2 * grid[0]) + jnp.cos(2 * grid[1]))
                 * (jnp.cos(2 * grid[2]) + 2)])
        return p, u

    @property
    def boundaries(self) -> List["Boundary"]:
        return []


def TaylorGreenVortex2D(context, resolution, reynolds_number, mach_number,
                        stencil=None, equilibrium=None):
    warnings.warn("TaylorGreenVortex2D is deprecated. Use TaylorGreenVortex "
                  "instead", DeprecationWarning)
    return TaylorGreenVortex(context, resolution, reynolds_number,
                             mach_number, stencil, equilibrium)


def TaylorGreenVortex3D(context, resolution, reynolds_number, mach_number,
                        stencil=None, equilibrium=None):
    warnings.warn("TaylorGreenVortex3D is deprecated. Use TaylorGreenVortex "
                  "instead", DeprecationWarning)
    return TaylorGreenVortex(context, resolution, reynolds_number,
                             mach_number, stencil, equilibrium)
