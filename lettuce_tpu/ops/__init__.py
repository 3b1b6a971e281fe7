from .equilibrium import (QuadraticEquilibrium,
                          QuadraticEquilibriumLessMemory,
                          IncompressibleQuadraticEquilibrium)
from .collision import (Collision, BGKCollision, NoCollision, TRTCollision,
                        MRTCollision, RegularizedCollision, KBCCollision,
                        KBCCollision2D, KBCCollision3D, SmagorinskyCollision,
                        CumulantCollision)
from .boundary import (BounceBackBoundary, EquilibriumBoundaryPU,
                       AntiBounceBackOutlet, EquilibriumOutletP,
                       SpongeOutlet, PeriodicPressureBC)
from .force import Force, Guo, ShanChen
from .streaming import stream

__all__ = [
    "QuadraticEquilibrium", "QuadraticEquilibriumLessMemory",
    "IncompressibleQuadraticEquilibrium",
    "Collision", "BGKCollision", "NoCollision", "TRTCollision",
    "MRTCollision", "RegularizedCollision", "KBCCollision",
    "KBCCollision2D", "KBCCollision3D", "SmagorinskyCollision",
    "CumulantCollision",
    "BounceBackBoundary", "EquilibriumBoundaryPU", "AntiBounceBackOutlet",
    "EquilibriumOutletP", "SpongeOutlet", "PeriodicPressureBC",
    "Force", "Guo", "ShanChen",
    "stream",
]
