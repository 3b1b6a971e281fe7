"""Template-method base for concrete flow cases.

Parity with reference ``ExtFlow`` (``/root/reference/lettuce/ext/_flows/
_ext_flow.py:8-43``): common constructor (resolution normalisation, default
stencil per dimension, default quadratic equilibrium), with subclasses
providing ``make_resolution`` / ``make_units`` / ``initial_pu`` /
``boundaries``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import List, Optional, Union

from ..flow import Flow
from ..ops.equilibrium import QuadraticEquilibrium
from ..stencil import D1Q3, D2Q9, D3Q19

__all__ = ["ExtFlow"]


class ExtFlow(Flow, ABC):
    def __init__(self, context: "Context", resolution: Union[int, List[int]],
                 reynolds_number, mach_number,
                 stencil: Optional["Stencil"] = None,
                 equilibrium: Optional["Equilibrium"] = None):
        resolution = self.make_resolution(resolution, stencil)
        assert len(resolution) in [1, 2, 3], \
            (f"flow supports dimensions 1, 2 and 3 but {len(resolution)} "
             f"dimensions were requested.")
        default_stencils = [D1Q3(), D2Q9(), D3Q19()]
        stencil = stencil or default_stencils[len(resolution) - 1]
        stencil = stencil() if callable(stencil) else stencil

        equilibrium = equilibrium or QuadraticEquilibrium()
        Flow.__init__(self, context, resolution,
                      self.make_units(reynolds_number, mach_number,
                                      resolution),
                      stencil, equilibrium)

    @abstractmethod
    def make_resolution(self, resolution: Union[int, List[int]],
                        stencil: Optional["Stencil"] = None) -> List[int]:
        ...

    @abstractmethod
    def make_units(self, reynolds_number, mach_number,
                   resolution: List[int]) -> "UnitConversion":
        ...
