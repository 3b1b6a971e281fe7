"""MRT kernel-spec resolution (kept out of stream_collide to avoid a
module cycle with utils.moments)."""

from __future__ import annotations

import numpy as np


def resolve_mrt_spec(collision) -> tuple:
    """Build the ("mrt", M, Minv, taus, meq_kind) kernel spec for an
    MRTCollision whose transform has a closed-form equilibrium implemented
    in the kernel (D2Q9 Lallemand / Dellar, D3Q27 tensor-Hermite)."""
    from ..utils.moments import (D2Q9Dellar, D2Q9Lallemand, D3Q27Hermite,
                                 D3Q19DHumieres)

    tr = collision.transform
    if isinstance(tr, D2Q9Lallemand):
        meq_kind = "lallemand"
    elif isinstance(tr, D2Q9Dellar):
        meq_kind = "dellar"
    elif isinstance(tr, D3Q27Hermite):
        meq_kind = "hermite27"
    elif isinstance(tr, D3Q19DHumieres):
        # equilibrium = exact moment image of feq, computed in-kernel
        meq_kind = "from_feq"
    else:
        raise NotImplementedError(type(tr).__name__)
    M = tuple(tuple(float(x) for x in row) for row in np.asarray(tr.matrix))
    Minv = tuple(tuple(float(x) for x in row)
                 for row in np.asarray(tr.inverse))
    taus = tuple(float(t)
                 for t in np.asarray(collision.relaxation_parameters))
    if len(taus) != len(M):
        raise NotImplementedError("per-moment relaxation list required")
    return ("mrt", M, Minv, taus, meq_kind)
