"""Lid-driven cavity flow.

Parity with reference ``/root/reference/lettuce/ext/_flows/
liddrivencavity.py``: bounce-back side/bottom walls plus a moving-lid
``EquilibriumBoundaryPU`` on the top face.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..ops.boundary import BounceBackBoundary, EquilibriumBoundaryPU
from ..unit import UnitConversion
from ._ext_flow import ExtFlow

__all__ = ["Cavity2D"]


class Cavity2D(ExtFlow):

    def __init__(self, context: "Context", resolution, reynolds_number,
                 mach_number):
        super().__init__(context, resolution, reynolds_number, mach_number)

    def make_resolution(self, resolution: Union[int, List[int]],
                        stencil: Optional["Stencil"] = None) -> List[int]:
        if isinstance(resolution, int):
            return [resolution] * 2
        assert len(resolution) == 2, "expected 2-dimensional resolution"
        return resolution

    def make_units(self, reynolds_number, mach_number,
                   resolution: List[int]) -> "UnitConversion":
        return UnitConversion(
            reynolds_number=reynolds_number, mach_number=mach_number,
            characteristic_length_lu=resolution[0],
            characteristic_length_pu=1,
            characteristic_velocity_pu=1)

    def initial_pu(self):
        zeros = jnp.zeros(tuple(self.resolution), dtype=self.context.dtype)
        return zeros[None, ...], jnp.stack([zeros] * 2)

    @property
    def grid(self):
        xyz = tuple(
            jnp.linspace(0, 1 - 1 / n, n, dtype=self.context.dtype)
            for n in self.resolution)
        return jnp.meshgrid(*xyz, indexing="ij")

    @property
    def boundaries(self):
        shape = tuple(self.resolution)
        walls = np.zeros(shape, dtype=bool)
        top = np.zeros(shape, dtype=bool)
        walls[[0, -1], 1:] = True   # left and right
        walls[:, 0] = True          # bottom
        top[:, -1] = True           # lid
        return [
            BounceBackBoundary(walls),
            EquilibriumBoundaryPU(
                self.context, top,
                [float(self.units.characteristic_velocity_pu), 0.0]),
        ]
