from ._ext_flow import ExtFlow
from .taylorgreen import (TaylorGreenVortex, TaylorGreenVortex2D,
                          TaylorGreenVortex3D)
from .couette import CouetteFlow2D
from .poiseuille import PoiseuilleFlow2D
from .doublyshear import DoublyPeriodicShear2D
from .decayingturbulence import DecayingTurbulence
from .obstacle import Obstacle, Obstacle2D, Obstacle3D
from .liddrivencavity import Cavity2D
from .mixinglayer import MixingLayer

from ..stencil import D2Q9, D3Q19

# CLI registry (reference ext/_flows/_flow_by_name.py:10-16)
flow_by_name = {
    'taylor2d': (TaylorGreenVortex, D2Q9),
    'taylor3d': (TaylorGreenVortex, D3Q19),
    'poiseuille2d': (PoiseuilleFlow2D, D2Q9),
    'shear2d': (DoublyPeriodicShear2D, D2Q9),
    'couette2d': (CouetteFlow2D, D2Q9),
    'decay2d': (DecayingTurbulence, D2Q9),
    # beyond the reference registry: the reference defines this flow only
    # ad hoc in examples/advanced_flows/MixingLayer.ipynb
    'mixing2d': (MixingLayer, D2Q9),
}

__all__ = ["ExtFlow", "TaylorGreenVortex", "TaylorGreenVortex2D",
           "TaylorGreenVortex3D", "CouetteFlow2D", "PoiseuilleFlow2D",
           "DoublyPeriodicShear2D", "DecayingTurbulence", "Obstacle",
           "Obstacle2D", "Obstacle3D", "Cavity2D", "MixingLayer",
           "flow_by_name"]
