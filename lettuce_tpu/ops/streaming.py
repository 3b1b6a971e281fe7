"""Streaming (advection) step.

The reference streams with per-q ``torch.roll`` over the grid axes
(``_simulation.py:160-175``). Here the same periodic semantics are a single
traced expression: one ``jnp.roll`` per discrete velocity, stacked. XLA
fuses the rolls with the surrounding collision arithmetic into one
memory-bound pass; the Pallas kernel path fuses them by construction.

``no_streaming_mask`` (per-(q, node) bool) freezes populations in place,
identical to the reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["stream"]


def stream(f: jax.Array, e: np.ndarray,
           no_streaming_mask: Optional[jax.Array] = None) -> jax.Array:
    """Periodic streaming: f_q(x + e_q) <- f_q(x) for every q.

    ``e`` must be a *numpy* [q, d] table — the shifts are static metadata
    baked into the compiled program.
    """
    e = np.asarray(e)
    q, d = e.shape
    axes = tuple(range(d))
    rolled = [f[0]]  # e[0] == 0 for all stencils
    for i in range(1, q):
        rolled.append(jnp.roll(f[i], tuple(int(s) for s in e[i]), axis=axes))
    streamed = jnp.stack(rolled)
    if no_streaming_mask is not None:
        streamed = jnp.where(no_streaming_mask, f, streamed)
    return streamed
