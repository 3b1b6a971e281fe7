"""Fused streaming + collision Pallas TPU kernel.

This is the TPU-native replacement for the reference's runtime CUDA codegen
(``/root/reference/lettuce/cuda_native/_template.py:128-368``): ONE kernel
per step reads every population once from HBM and writes every population
once — the theoretical minimum memory traffic (2 * q * N * dtype bytes per
step, the LBM speed-of-light on a bandwidth-bound chip).

Design (vs. the reference's CUDA push-streaming):
  * **pull streaming**: each output block gathers post-collision values from
    e-shifted source cells, so all writes stay block-local — the CUDA
    kernel's global scattered writes (``_template.py:266-294``) would
    thrash on TPU;
  * the grid is blocked over the leading spatial axes; the minor (lane)
    axis stays whole in VMEM, so its periodic shift is an in-register
    ``pltpu.roll``;
  * halo rows/columns arrive via explicit async DMAs with modular source
    indices — periodic wraparound needs no special-casing;
  * moments use add/sub trees over the unrolled q populations (e components
    are in {-1, 0, 1}: no multiplies);
  * boundary handling mirrors the reference pipeline exactly
    (``_simulation.py:177-189``): uint8 index-coded ``no_collision_mask``
    selects bounce-back / equilibrium replacements per node, and the
    per-(q, node) ``no_streaming_mask`` freezes populations (applied in
    pull form at the destination).

Supported natively (rest falls back to the XLA-fused jnp path, like the
reference falls back to its Python step): BGK / NoCollision,
QuadraticEquilibrium, BounceBackBoundary, EquilibriumBoundaryPU with
uniform velocity/pressure.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_fused_step", "fused_stream_collide"]


def _pick_block(extent: int, target: int) -> int:
    """Largest divisor of ``extent`` that is <= target."""
    for b in range(min(target, extent), 0, -1):
        if extent % b == 0:
            return b
    return 1


def _roll_minor(x, shift: int):
    """Periodic shift along the last (lane) axis."""
    if shift == 0:
        return x
    return pltpu.roll(x, shift, axis=x.ndim - 1)


def _feq_terms(e_row, w_q, cs2, rho, u, u2):
    """Quadratic equilibrium for one q: w rho (1 + eu/cs2 + eu^2/(2 cs4)
    - u2/(2 cs2)) with eu built by add/sub."""
    eu = None
    for comp, uc in zip(e_row, u):
        if comp == 0:
            continue
        term = uc if comp == 1 else -uc
        eu = term if eu is None else eu + term
    if eu is None:
        return w_q * rho * (1.0 - u2 / (2 * cs2))
    return w_q * rho * (1.0 + eu / cs2 + (eu * eu) / (2 * cs2 * cs2)
                        - u2 / (2 * cs2))


def _moments(fs, e: np.ndarray):
    """rho and velocity from the unrolled population list (add/sub trees)."""
    q, d = e.shape
    rho = fs[0]
    for qi in range(1, q):
        rho = rho + fs[qi]
    inv_rho = 1.0 / rho
    u = []
    for a in range(d):
        ja = None
        for qi in range(q):
            if e[qi, a] == 1:
                ja = fs[qi] if ja is None else ja + fs[qi]
        for qi in range(q):
            if e[qi, a] == -1:
                ja = -fs[qi] if ja is None else ja - fs[qi]
        u.append(ja * inv_rho)
    return rho, u


def _stream_collide_kernel(
        # refs: [f_hbm, (ncm_hbm), (nsm_block)], out_ref, then scratch
        *refs,
        e: np.ndarray, w: np.ndarray, opposite: np.ndarray, cs: float,
        tau_inv: Optional[float], block: Tuple[int, ...],
        shape: Tuple[int, ...], has_ncm: bool, has_nsm: bool,
        boundary_kinds: Tuple[Tuple[str, int], ...],
        feq_boundary: Optional[np.ndarray]):
    """Kernel body, shared by 2D and 3D (d = len(block))."""
    d = len(shape)
    q = e.shape[0]
    cs2 = cs * cs

    idx = 0
    f_hbm = refs[idx]; idx += 1
    ncm_hbm = None
    if has_ncm:
        ncm_hbm = refs[idx]; idx += 1
    nsm_block = None
    if has_nsm:
        nsm_block = refs[idx]; idx += 1
    out_ref = refs[idx]; idx += 1
    slab = refs[idx]; idx += 1
    ncm_slab = None
    if has_ncm:
        ncm_slab = refs[idx]; idx += 1
    sems = refs[idx]; idx += 1

    # ------------------------------------------------------------------
    # halo DMAs: for each blocked axis, fetch centre + two halo planes
    # with modular (periodic) source rows
    # ------------------------------------------------------------------
    # blocked axes are the leading `len(block)-?`... we block all but the
    # minor axis: block = (B0,) for 2D [q, X, Y] or (B0, B1) for 3D.
    n_blocked = len(block)
    starts = [pl.program_id(a) * block[a] for a in range(n_blocked)]
    extents = [shape[a] for a in range(n_blocked)]

    # source/destination segment lists per blocked axis:
    # (src_start, dst_start, size)
    def segments(axis):
        x0, bx, ex = starts[axis], block[axis], extents[axis]
        return [((x0 - 1) % ex, 0, 1),
                (x0, 1, bx),
                ((x0 + bx) % ex, bx + 1, 1)]

    copies = []
    if n_blocked == 1:
        for (src, dst, size) in segments(0):
            copies.append((
                f_hbm.at[:, pl.ds(src, size), :],
                slab.at[:, pl.ds(dst, size), :]))
            if has_ncm:
                copies.append((
                    ncm_hbm.at[pl.ds(src, size), :],
                    ncm_slab.at[pl.ds(dst, size), :]))
    else:
        for (src_x, dst_x, sx) in segments(0):
            for (src_y, dst_y, sy) in segments(1):
                copies.append((
                    f_hbm.at[:, pl.ds(src_x, sx), pl.ds(src_y, sy), :],
                    slab.at[:, pl.ds(dst_x, sx), pl.ds(dst_y, sy), :]))
                if has_ncm:
                    copies.append((
                        ncm_hbm.at[pl.ds(src_x, sx), pl.ds(src_y, sy), :],
                        ncm_slab.at[pl.ds(dst_x, sx), pl.ds(dst_y, sy), :]))

    dmas = []
    for k, (src, dst) in enumerate(copies):
        dma = pltpu.make_async_copy(src, dst, sems.at[k])
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()

    # ------------------------------------------------------------------
    # collide on the full slab (including halo cells: 1-deep redundant
    # compute replaces a second communication round)
    # ------------------------------------------------------------------
    fs = [slab[qi] for qi in range(q)]
    rho, u = _moments(fs, e)
    u2 = None
    for uc in u:
        u2 = uc * uc if u2 is None else u2 + uc * uc

    ncm = ncm_slab[:] if has_ncm else None

    fpost = []
    for qi in range(q):
        feq = _feq_terms(e[qi], float(w[qi]), cs2, rho, u, u2)
        if tau_inv is None:  # NoCollision
            collided = fs[qi]
        else:
            collided = fs[qi] - tau_inv * (fs[qi] - feq)
        if has_ncm:
            collided = jnp.where(ncm == 0, collided, fs[qi])
        fpost.append(collided)

    # boundary replacements, in mask-code order (reference pipeline)
    for kind, index in boundary_kinds:
        if kind == "bounce_back":
            replaced = [jnp.where(ncm == index, fs[int(opposite[qi])],
                                  fpost[qi]) for qi in range(q)]
            fpost = replaced
        elif kind == "equilibrium_pu":
            replaced = [jnp.where(ncm == index,
                                  jnp.full_like(fpost[qi],
                                                float(feq_boundary[index - 1]
                                                      [qi])),
                                  fpost[qi]) for qi in range(q)]
            fpost = replaced

    # ------------------------------------------------------------------
    # pull streaming: out[q, x] = fpost[q, x - e_q]; blocked axes by
    # static slab offsets, minor axis by lane roll
    # ------------------------------------------------------------------
    for qi in range(q):
        shifted = fpost[qi]
        if n_blocked == 1:
            ex = int(e[qi, 0])
            shifted = shifted[1 - ex:1 - ex + block[0], :]
            shifted = _roll_minor(shifted, int(e[qi, 1]))
        else:
            ex, ey = int(e[qi, 0]), int(e[qi, 1])
            shifted = shifted[1 - ex:1 - ex + block[0],
                              1 - ey:1 - ey + block[1], :]
            shifted = _roll_minor(shifted, int(e[qi, 2]))
        if has_nsm:
            # frozen populations keep their (post-collision) local value
            frozen = fpost[qi][tuple(slice(1, 1 + b) for b in block)]
            shifted = jnp.where(nsm_block[qi], frozen, shifted)
        out_ref[qi] = shifted


def fused_stream_collide(f: jax.Array, e: np.ndarray, w: np.ndarray,
                         opposite: np.ndarray, cs: float,
                         tau_inv: Optional[float],
                         no_collision_mask: Optional[jax.Array] = None,
                         no_streaming_mask: Optional[jax.Array] = None,
                         boundary_kinds: Tuple[Tuple[str, int], ...] = (),
                         feq_boundary: Optional[np.ndarray] = None,
                         block_target: Tuple[int, int] = (8, 8),
                         interpret: bool = False) -> jax.Array:
    """One fused collide-and-stream step via Pallas.

    f: [q, X, Y] or [q, X, Y, Z]. Blocked over X (2D) or X, Y (3D); the
    minor axis stays whole in VMEM.
    """
    q = e.shape[0]
    shape = f.shape[1:]
    d = len(shape)
    assert d in (2, 3)

    if d == 2:
        bx = _pick_block(shape[0], 256 if shape[1] <= 512 else 64)
        block = (bx,)
        grid = (shape[0] // bx,)
        out_block = (q, bx, shape[1])
        out_index = lambda i: (0, i, 0)
        nsm_index = out_index
    else:
        bx = _pick_block(shape[0], block_target[0])
        by = _pick_block(shape[1], block_target[1])
        block = (bx, by)
        grid = (shape[0] // bx, shape[1] // by)
        out_block = (q, bx, by, shape[2])
        out_index = lambda i, j: (0, i, j, 0)
        nsm_index = out_index

    has_ncm = no_collision_mask is not None
    has_nsm = no_streaming_mask is not None

    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    inputs = [f]
    if has_ncm:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        inputs.append(no_collision_mask.astype(jnp.int32))
    if has_nsm:
        # destination-indexed, so a plain blocked spec suffices
        in_specs.append(pl.BlockSpec((1,) * 0 + out_block, out_index,
                                     memory_space=pltpu.VMEM))
        inputs.append(no_streaming_mask)

    slab_shape = (q,) + tuple(b + 2 for b in block) + (shape[-1],)
    scratch = [pltpu.VMEM(slab_shape, f.dtype)]
    n_dma = (3 if d == 2 else 9) * (2 if has_ncm else 1)
    if has_ncm:
        scratch.append(pltpu.VMEM(tuple(b + 2 for b in block)
                                  + (shape[-1],), jnp.int32))
    scratch.append(pltpu.SemaphoreType.DMA((n_dma,)))

    kernel = partial(
        _stream_collide_kernel,
        e=e, w=w, opposite=opposite, cs=cs, tau_inv=tau_inv,
        block=block, shape=shape, has_ncm=has_ncm, has_nsm=has_nsm,
        boundary_kinds=tuple(boundary_kinds), feq_boundary=feq_boundary)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(out_block, out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)


def build_fused_step(simulation: "Simulation"):
    """Capability-gated construction of the fused step for a Simulation.

    Raises NotImplementedError when any component cannot run inside the
    kernel; the Simulation then falls back to the jnp path.
    """
    from ..collision import BGKCollision, NoCollision
    from ..equilibrium import QuadraticEquilibrium
    from ..boundary import BounceBackBoundary, EquilibriumBoundaryPU

    flow = simulation.flow
    stencil = flow.stencil
    d = stencil.d
    if d not in (2, 3):
        raise NotImplementedError("pallas kernel supports 2D/3D only")
    if not isinstance(flow.equilibrium, QuadraticEquilibrium):
        raise NotImplementedError
    # minor axis must be lane-friendly; tiny grids are not worth it
    if flow.resolution[-1] % 128 != 0:
        raise NotImplementedError("minor axis must be a multiple of 128")

    collision = simulation.collision
    if isinstance(collision, BGKCollision):
        if collision.force is not None:
            raise NotImplementedError
        tau_inv = float(1.0 / collision.tau)
    elif isinstance(collision, NoCollision):
        tau_inv = None
    else:
        raise NotImplementedError

    boundary_kinds: List[Tuple[str, int]] = []
    feq_b = np.zeros((len(simulation.boundaries) - 1, stencil.q))
    for index, boundary in enumerate(simulation.boundaries[1:], start=1):
        if isinstance(boundary, BounceBackBoundary):
            boundary_kinds.append(("bounce_back", index))
        elif isinstance(boundary, EquilibriumBoundaryPU):
            if boundary.velocity.ndim > 1:
                raise NotImplementedError("per-node boundary velocity")
            rho = flow.units.convert_pressure_pu_to_density_lu(
                boundary.pressure)
            u = flow.units.convert_velocity_to_lu(boundary.velocity)
            feq = flow.equilibrium(flow, rho=jnp.asarray(rho), u=u)
            feq_b[index - 1] = np.asarray(feq, dtype=np.float64)
            boundary_kinds.append(("equilibrium_pu", index))
        else:
            raise NotImplementedError(type(boundary).__name__)

    e = np.asarray(stencil.e)
    w = np.asarray(stencil.w)
    opposite = np.asarray(stencil.opposite)
    cs = float(stencil.cs)
    interpret = simulation.context.platform not in ("tpu",)

    ncm = simulation.no_collision_mask
    nsm = simulation.no_streaming_mask
    if nsm is not None and not bool(np.any(np.asarray(nsm))):
        nsm = None

    def step(f):
        return fused_stream_collide(
            f, e, w, opposite, cs, tau_inv,
            no_collision_mask=ncm, no_streaming_mask=nsm,
            boundary_kinds=tuple(boundary_kinds),
            feq_boundary=feq_b, interpret=interpret)

    return step
