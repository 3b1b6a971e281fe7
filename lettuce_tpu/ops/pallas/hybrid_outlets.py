"""Exact jnp fix-up that lets outlet boundaries ride the fused kernel.

The outlets (``AntiBounceBackOutlet``, ``EquilibriumOutletP``,
``SpongeOutlet``) have no kernel fragment — in the reference they have no
native path either (``cuda_native`` emits nothing for them), so flows
like the Obstacle family dropped to the slow jnp step whenever an outlet
was present.

Observation: an outlet only changes f_post on the handful of grid planes
it owns, so the fused kernel can run the whole domain treating those
nodes as frozen (``gate_fused_params`` simply emits no fragment for them
— unmatched ``no_collision_mask`` codes default to identity f_post in
the kernel), and a cheap jnp pass afterwards recomputes the EXACT step
result on the affected planes only:

  * sources: the planes owned by the outlet (f_post there is the outlet
    replacement, not identity),
  * targets: those planes plus their axis neighbours (pull distance 1,
    or n_sub under temporal blocking), including the periodic wrap onto
    the opposite domain edge.

The fix-up extracts a contiguous *periodic window* around the face
(owned planes +- 2 n_sub), replays the step composition of
``Simulation._step_jnp_body`` on that window — collision, every
boundary, streaming with the frozen-population mask — and writes the
target planes back over the kernel output. Rolls inside the window are
correct wherever they are consumed: the owned planes sit >= 2 n_sub
planes from the window edge, targets >= n_sub. Cost per step is
O(q * window * transverse), a few planes against the kernel's full-grid
pass.

Multiple outlets compose: each window replay includes EVERY boundary via
the index-coded mask, so each fix-up's rewritten planes are exact
regardless of the others, and sequential application commutes (in any
overlap both fix-ups write the same exact values).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..streaming import stream

__all__ = ["build_hybrid_fixup", "build_hybrid_fixup_sharded"]


def _take_window(arr, axis: int, lo: int, width: int, n: int):
    """Contiguous periodic window ``[lo, lo + width)`` (mod n) along
    ``axis`` — at most two slices, no gather."""
    lo %= n
    sel = [slice(None)] * arr.ndim
    if lo + width <= n:
        sel[axis] = slice(lo, lo + width)
        return arr[tuple(sel)]
    sel[axis] = slice(lo, n)
    first = arr[tuple(sel)]
    sel[axis] = slice(0, lo + width - n)
    return jnp.concatenate([first, arr[tuple(sel)]], axis=axis)


def _set_window(arr, values, axis: int, lo: int, width: int, n: int,
                sub=None):
    """Write ``values`` over the periodic window ``[lo, lo+width)``;
    ``sub`` optionally restricts other (ghost-padded) axes of ``arr`` to
    their true extents (``values`` is true-shaped there).

    Writes go through ``lax.dynamic_update_slice``, NOT ``.at[...].set``:
    when ``arr`` is a GSPMD-sharded global array (the sharded kernel
    paths apply this fix-up outside ``shard_map``), XLA miscompiles a
    CHAIN of two sliced scatter-sets whose window wraps the periodic
    edge — the second update lands on the local row 0 of EVERY shard
    (observed jax 0.9.0, cpu and tpu backends; single sets and DUS
    chains partition correctly)."""
    lo %= n
    starts = [0] * arr.ndim
    if sub:
        for ax, s in sub.items():
            starts[ax] = int(s.start or 0)

    def put(target, vals, start):
        st = list(starts)
        st[axis] = start
        return jax.lax.dynamic_update_slice(target, vals, tuple(st))

    if lo + width <= n:
        return put(arr, values, lo)
    vsel = [slice(None)] * arr.ndim
    vsel[axis] = slice(0, n - lo)
    arr = put(arr, values[tuple(vsel)], lo)
    vsel[axis] = slice(n - lo, width)
    return put(arr, values[tuple(vsel)], 0)


def _build_one_fixup(simulation: "Simulation", index_h: int,
                     outlet: "Boundary", n_sub: int, pad_plan=None):
    """Window fix-up for a single outlet; see module docstring.

    With ``pad_plan`` (ghost-image padding, ``padding.py``) the step
    operates on padded arrays: the window is taken with the *true*
    face-axis extent (so it never touches ghost planes there), transverse
    ghost bands are stripped before the replay (rolls must wrap at true
    extents), and the write-back targets the true region only — the
    caller's post-step image refresh re-propagates the corrections.
    """
    flow = simulation.flow
    e = np.asarray(flow.stencil.e)
    axis = outlet.face_axis          # grid axis of the outlet face
    n = int(flow.resolution[axis])
    strip = (pad_plan.transverse_true_slices(axis, lead=1)
             if pad_plan is not None else None)

    ncm_np = np.asarray(simulation.no_collision_mask)
    owned = np.nonzero(ncm_np == index_h)[axis]
    if owned.size == 0:
        raise NotImplementedError("outlet owns no nodes (mask overlap)")
    pos = np.unique(owned)
    lo_p, hi_p = int(pos.min()), int(pos.max())
    if hi_p - lo_p + 1 != len(pos):
        raise NotImplementedError("outlet planes are not contiguous")
    win_lo = lo_p - 2 * n_sub
    width = (hi_p - lo_p + 1) + 4 * n_sub
    if width >= n:
        raise NotImplementedError("fix-up window spans the whole axis")

    ncm_win = jnp.asarray(_take_window(
        simulation.no_collision_mask, axis, win_lo, width, n))
    nsm_win = None
    if simulation.no_streaming_mask is not None:
        nsm_win = _take_window(simulation.no_streaming_mask, axis + 1,
                               win_lo, width, n)

    # boundaries whose internal fields carry face-axis positions expose
    # window_view to re-slice them into window-local coordinates
    boundaries: List = [
        b.window_view(axis, win_lo, width, n)
        if hasattr(b, "window_view") else b
        for b in simulation.boundaries[1:]]
    collision = simulation.collision

    def fixup(f_pre: jax.Array, f_kernel: jax.Array) -> jax.Array:
        f_win = _take_window(f_pre, axis + 1, win_lo, width, n)
        if strip:
            sel = [slice(None)] * f_win.ndim
            for ax, s in strip.items():
                sel[ax] = s
            f_win = f_win[tuple(sel)]
        for _ in range(n_sub):
            # identical sequential composition to Simulation._step_jnp_body:
            # each boundary reads the field updated by the previous one
            fpost = jnp.where(ncm_win == 0, collision(flow.view(f_win)),
                              f_win)
            for i, boundary in enumerate(boundaries, start=1):
                fpost = jnp.where(ncm_win == i, boundary(flow.view(fpost)),
                                  fpost)
            f_win = stream(fpost, e, nsm_win)
        # targets = owned planes +- n_sub -> window-local
        # [n_sub, width - n_sub)
        tsel = [slice(None)] * f_win.ndim
        tsel[axis + 1] = slice(n_sub, width - n_sub)
        return _set_window(f_kernel, f_win[tuple(tsel)], axis + 1,
                           win_lo + n_sub, width - 2 * n_sub, n, sub=strip)

    rewritten = np.array([(win_lo + n_sub + k) % n
                          for k in range(width - 2 * n_sub)])
    return fixup, axis, rewritten


def _build_one_fixup_sharded(simulation: "Simulation", index_h: int,
                             outlet: "Boundary", pernode, shard_axis: int,
                             pad_plan=None):
    """Shard-local window fix-up for one outlet (``shard_map`` body).

    Same windowed replay as :func:`_build_one_fixup`, with two
    differences forced by running inside ``shard_map``:

    * masks and the combined per-node equilibrium field arrive as
      *runtime operands* (the local shard of each), so the window slices
      are taken at call time instead of baked in as constants — the
      window geometry itself is static because the face axis is required
      to be complete on every shard (``shard_step`` asserts it);
    * per-node equilibrium boundaries are replaced from the combined feq
      operand (their prescribed fields are global-shaped), mirroring the
      sharded jnp path's composition.

    The replay's streaming wraps periodically over the *local* shard, so
    its result is wrong on the first/last plane along ``shard_axis`` —
    the caller's ppermute edge-plane fix overwrites exactly those planes
    afterwards with globally-correct values (which include every
    boundary, applied on the neighbour's edge slab).

    With ``pad_plan`` (ghost-image padding on the LOCAL shard shape,
    whose padded axes are all unsharded) the operands carry ghost-image
    bands: the window is taken at the true face-axis extent, transverse
    ghost bands are stripped before the replay (rolls must wrap at true
    extents — the shard axis is never padded, so its local wrap
    semantics are unchanged), and the write-back targets the true
    region only; the caller's post-step image refresh re-propagates the
    corrections onto the ghost bands.
    """
    flow = simulation.flow
    e = np.asarray(flow.stencil.e)
    axis = outlet.face_axis
    assert axis != shard_axis
    n = int(flow.resolution[axis])
    n_sub = 1
    strip_f = (pad_plan.transverse_true_slices(axis, lead=1)
               if pad_plan is not None else None)
    strip_g = (pad_plan.transverse_true_slices(axis, lead=0)
               if pad_plan is not None else None)

    def _strip(arr, sub):
        if not sub or arr is None:
            return arr
        sel = [slice(None)] * arr.ndim
        for ax, s in sub.items():
            sel[ax] = s
        return arr[tuple(sel)]

    ncm_np = np.asarray(simulation.no_collision_mask)
    owned = np.nonzero(ncm_np == index_h)[axis]
    if owned.size == 0:
        raise NotImplementedError("outlet owns no nodes (mask overlap)")
    pos = np.unique(owned)
    lo_p, hi_p = int(pos.min()), int(pos.max())
    if hi_p - lo_p + 1 != len(pos):
        raise NotImplementedError("outlet planes are not contiguous")
    win_lo = lo_p - 2 * n_sub
    width = (hi_p - lo_p + 1) + 4 * n_sub
    if width >= n:
        raise NotImplementedError("fix-up window spans the whole axis")

    boundaries: List = [
        b.window_view(axis, win_lo, width, n)
        if hasattr(b, "window_view") else b
        for b in simulation.boundaries[1:]]
    collision = simulation.collision

    def fixup(f_pre, f_kernel, ncm_l, nsm_l, feq_l):
        f_win = _strip(_take_window(f_pre, axis + 1, win_lo, width, n),
                       strip_f)
        ncm_win = _strip(_take_window(ncm_l, axis, win_lo, width, n),
                         strip_g)
        nsm_win = (None if nsm_l is None else _strip(
            _take_window(nsm_l, axis + 1, win_lo, width, n), strip_f))
        feq_win = (None if feq_l is None else _strip(
            _take_window(feq_l, axis + 1, win_lo, width, n), strip_f))
        fpost = jnp.where(ncm_win == 0, collision(flow.view(f_win)), f_win)
        for i, boundary in enumerate(boundaries, start=1):
            if i in pernode:
                fpost = jnp.where(ncm_win == i, feq_win, fpost)
            else:
                fpost = jnp.where(ncm_win == i, boundary(flow.view(fpost)),
                                  fpost)
        f_win = stream(fpost, e, nsm_win)
        tsel = [slice(None)] * f_win.ndim
        tsel[axis + 1] = slice(n_sub, width - n_sub)
        return _set_window(f_kernel, f_win[tuple(tsel)], axis + 1,
                           win_lo + n_sub, width - 2 * n_sub, n,
                           sub=strip_f)

    return fixup


def build_hybrid_fixup_sharded(simulation: "Simulation",
                               hybrid, pernode, shard_axis: int,
                               pad_plan=None):
    """Shard-local fix-up for every frozen outlet; see
    :func:`_build_one_fixup_sharded`. Returns
    ``fixup(f_pre, f_kernel, ncm_l, nsm_l, feq_l)`` or raises
    ``NotImplementedError`` for configurations outside the windowed
    formulation (caller falls back to the jnp sharded step)."""
    parts = [_build_one_fixup_sharded(simulation, index_h, outlet,
                                      pernode, shard_axis,
                                      pad_plan=pad_plan)
             for index_h, outlet in hybrid]
    if len(parts) == 1:
        return parts[0]

    def fixup(f_pre, f_kernel, ncm_l, nsm_l, feq_l):
        out = f_kernel
        for one in parts:
            out = one(f_pre, out, ncm_l, nsm_l, feq_l)
        return out

    return fixup


def build_hybrid_fixup(simulation: "Simulation",
                       hybrid: Tuple[Tuple[int, "Boundary"], ...],
                       n_sub: int = 1, pad_plan=None):
    """Build the fix-up for a simulation whose kernel step froze the
    given outlet boundaries.

    Returns ``(fixup, regions)`` where ``fixup(f_pre, f_kernel)`` yields
    the exact step result and ``regions`` is a list of
    ``(grid_axis, rewritten_plane_indices)`` — the caller may drop
    kernel work (e.g. the no-streaming mask) whose effects are confined
    to those planes.

    Raises NotImplementedError when a configuration falls outside the
    windowed formulation (non-contiguous owned planes, or a window
    spanning the whole axis) — the caller then falls back to the jnp
    step.
    """
    parts = [_build_one_fixup(simulation, index_h, outlet, n_sub,
                              pad_plan=pad_plan)
             for index_h, outlet in hybrid]

    if len(parts) == 1:
        one, axis, rewritten = parts[0]
        return one, [(axis, rewritten)]

    def fixup(f_pre: jax.Array, f_kernel: jax.Array) -> jax.Array:
        out = f_kernel
        for one, _, _ in parts:
            out = one(f_pre, out)
        return out

    return fixup, [(axis, rewritten) for _, axis, rewritten in parts]
