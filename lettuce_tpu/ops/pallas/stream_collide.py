"""Fused streaming + collision Pallas TPU kernel.

This is the TPU-native replacement for the reference's runtime CUDA codegen
(``/root/reference/lettuce/cuda_native/_template.py:128-368``): ONE kernel
per step reads every population once from HBM and writes every population
once — near the minimum memory traffic (2 * q * N * dtype bytes per step,
the LBM speed-of-light on a bandwidth-bound chip).

Key design points (vs. the reference's CUDA push-streaming):

* **pull streaming** — each output block gathers post-collision values from
  e-shifted source cells, so all writes stay block-local; the CUDA kernel's
  scattered global writes (``_template.py:266-294``) would defeat TPU
  tiling;
* **merged-minor layout** — internally f is viewed as
  ``[q, X, Y*S, 128]`` (3D, S = Z/128) or ``[q, X, Y/128, 128]`` (2D), a
  *free* reshape of the public ``[q, X, Y(, Z)]`` array. The last two dims
  are then large multiples of the (8, 128) tile, so vector ops waste no
  sublanes and DMA slices stay tile-aligned;
* halo planes arrive via explicit async DMAs with modular (periodic)
  source indices: 1-deep in x (dim 1 carries no tiling constraint) and
  8-row-aligned segments on the merged axis (covering the +-1 y cell);
* the minor-axis (z) periodic shift is a lane roll with a sublane-carry
  select; the carry distinguishes intra-y wraps via the s-phase of each
  merged row;
* moments are add/sub trees over the unrolled populations (e components in
  {-1, 0, 1}: no multiplies);
* boundary handling mirrors the reference pipeline exactly
  (``_simulation.py:177-189``): the uint8 index-coded ``no_collision_mask``
  selects bounce-back / equilibrium replacements per node and the
  per-(q, node) ``no_streaming_mask`` freezes populations (applied in pull
  form at the destination).

Supported natively (anything else falls back to the XLA-fused jnp path,
like the reference falls back to its Python step): BGK / NoCollision,
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

LANES = 128
YHALO = 8  # merged-axis halo depth (tile-aligned); only S rows are used


def _pick_block(extent: int, target: int, multiple: int = 1) -> int:
    """Largest divisor of ``extent`` that is <= target and a multiple of
    ``multiple``."""
    best = None
    for b in range(1, extent + 1):
        if extent % b == 0 and b % multiple == 0 and b <= target:
            best = b
    return best


def _roll_minor(x, shift: int, S: int):
    """Periodic shift of the minor spatial axis packed as (rows, 128
    lanes), where each packed cell group occupies ``S`` consecutive rows
    (S == number of sublane rows per y for 3D; for 2D, S == total rows and
    the whole row axis is one group).

    Only the interior rows of the result are meaningful when S divides the
    row count unevenly at tile edges — callers slice interiors afterwards.
    """
    if shift == 0:
        return x
    rows = x.shape[-2]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    if S == rows:
        # single group: plain packed roll
        if shift == 1:
            a = pltpu.roll(x, 1, axis=x.ndim - 1)
            b = pltpu.roll(a, 1, axis=x.ndim - 2)
            return jnp.where(lane == 0, b, a)
        else:
            a = pltpu.roll(x, LANES - 1, axis=x.ndim - 1)
            b = pltpu.roll(a, rows - 1, axis=x.ndim - 2)
            return jnp.where(lane == LANES - 1, b, a)
    # multiple groups of S rows: the carry row is m-1 within a group but
    # m+S-1 when wrapping at the group start (periodic z within each y)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
    s_phase = row % S
    if shift == 1:
        a = pltpu.roll(x, 1, axis=x.ndim - 1)
        if S == 1:
            return jnp.where(lane == 0, a, a)  # carry within same row
        b = pltpu.roll(a, 1, axis=x.ndim - 2)
        c = pltpu.roll(a, rows - (S - 1), axis=x.ndim - 2)
        carry = jnp.where(s_phase == 0, c, b)
        return jnp.where(lane == 0, carry, a)
    else:
        a = pltpu.roll(x, LANES - 1, axis=x.ndim - 1)
        if S == 1:
            return jnp.where(lane == LANES - 1, a, a)
        b = pltpu.roll(a, rows - 1, axis=x.ndim - 2)
        c = pltpu.roll(a, S - 1, axis=x.ndim - 2)
        carry = jnp.where(s_phase == S - 1, c, b)
        return jnp.where(lane == LANES - 1, carry, a)


def _feq_terms(e_row, w_q, cs2, rho, u, u2):
    """Quadratic equilibrium for one q: w rho (1 + eu/cs2 + eu^2/(2 cs4)
    - u2/(2 cs2)) with e.u built by add/sub."""
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


def _stream_collide_kernel(
        *refs,
        e: np.ndarray, w: np.ndarray, opposite: np.ndarray, cs: float,
        tau_inv: Optional[float], bx: int, by: Optional[int], S: int,
        X: int, YS: int, has_ncm: bool, has_nsm: bool,
        boundary_kinds: Tuple[Tuple[str, int], ...],
        feq_boundary: Optional[tuple]):
    """Kernel body (2D: by is None, no merged-axis blocking)."""
    q = e.shape[0]
    cs2 = cs * cs
    is3d = by is not None

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
    # halo DMAs with modular (periodic) source indices
    # ------------------------------------------------------------------
    x0 = pl.program_id(0) * bx
    x_segs = [((x0 - 1) % X, 0, 1), (x0, 1, bx), ((x0 + bx) % X, bx + 1, 1)]
    if is3d:
        bys = by * S
        m0 = pl.program_id(1) * bys
        m_segs = [((m0 - YHALO) % YS, 0, YHALO),
                  (m0, YHALO, bys),
                  ((m0 + bys) % YS, YHALO + bys, YHALO)]
    else:
        m_segs = [(0, 0, YS)]

    copies = []
    for (sx, dx_, nx) in x_segs:
        for (sm, dm, nm) in m_segs:
            copies.append((
                f_hbm.at[:, pl.ds(sx, nx), pl.ds(sm, nm)],
                slab.at[:, pl.ds(dx_, nx), pl.ds(dm, nm)]))
            if has_ncm:
                copies.append((
                    ncm_hbm.at[pl.ds(sx, nx), pl.ds(sm, nm)],
                    ncm_slab.at[pl.ds(dx_, nx), pl.ds(dm, nm)]))

    dmas = []
    for k, (src, dst) in enumerate(copies):
        dma = pltpu.make_async_copy(src, dst, sems.at[k])
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()

    # ------------------------------------------------------------------
    # moments on the whole slab (redundant halo compute replaces a second
    # communication round); populations re-read from the slab per use so
    # no q-length value list stays live
    # ------------------------------------------------------------------
    d = 3 if is3d else 2
    rho = None
    j = [None] * d
    for qi in range(q):
        fi = slab[qi]
        rho = fi if rho is None else rho + fi
        for a in range(d):
            if e[qi, a] == 1:
                j[a] = fi if j[a] is None else j[a] + fi
            elif e[qi, a] == -1:
                j[a] = -fi if j[a] is None else j[a] - fi
    inv_rho = 1.0 / rho
    u = [ja * inv_rho for ja in j]
    u2 = None
    for uc in u:
        u2 = uc * uc if u2 is None else u2 + uc * uc

    ncm = ncm_slab[:] if has_ncm else None
    if is3d:
        bys = by * S
        interior = (slice(1, 1 + bx), slice(YHALO, YHALO + bys))
    else:
        interior = (slice(1, 1 + bx), slice(0, YS))

    # ------------------------------------------------------------------
    # fused per-q pipeline: collide -> boundary replace -> pull-stream ->
    # write
    # ------------------------------------------------------------------
    for qi in range(q):
        fi = slab[qi]
        feq = _feq_terms(e[qi], float(w[qi]), cs2, rho, u, u2)
        if tau_inv is None:  # NoCollision
            fpost = fi
        else:
            fpost = fi - tau_inv * (fi - feq)
        if has_ncm:
            fpost = jnp.where(ncm == 0, fpost, fi)
        for kind, index in boundary_kinds:
            if kind == "bounce_back":
                fpost = jnp.where(ncm == index, slab[int(opposite[qi])],
                                  fpost)
            elif kind == "equilibrium_pu":
                fpost = jnp.where(ncm == index,
                                  jnp.full_like(fpost,
                                                feq_boundary[index - 1][qi]),
                                  fpost)

        # minor-axis shift first (uses only interior +- S rows, all valid)
        ez = int(e[qi, d - 1])
        shifted = _roll_minor(fpost, ez, S if is3d else YS)
        # then the blocked-axis shifts via slab-offset slicing
        ex = int(e[qi, 0])
        if is3d:
            ey = int(e[qi, 1])
            shifted = shifted[1 - ex:1 - ex + bx,
                              YHALO - ey * S:YHALO - ey * S + bys]
        else:
            shifted = shifted[1 - ex:1 - ex + bx, :]
        if has_nsm:
            shifted = jnp.where(nsm_block[qi], fpost[interior], shifted)
        out_ref[qi] = shifted


def fused_stream_collide(f: jax.Array, e: np.ndarray, w: np.ndarray,
                         opposite: np.ndarray, cs: float,
                         tau_inv: Optional[float],
                         no_collision_mask: Optional[jax.Array] = None,
                         no_streaming_mask: Optional[jax.Array] = None,
                         boundary_kinds: Tuple[Tuple[str, int], ...] = (),
                         feq_boundary: Optional[tuple] = None,
                         block_target: Tuple[int, int] = (8, 16),
                         block_target_2d: int = 64,
                         vmem_limit_mb: Optional[int] = None,
                         interpret: bool = False) -> jax.Array:
    """One fused collide-and-stream step via Pallas.

    f: [q, X, Y] or [q, X, Y, Z]; the minor axis must be a multiple of 128
    and, in 3D, Z/128 must divide 8 (Z in {128, 256, 512, 1024}).
    """
    q = e.shape[0]
    shape = f.shape[1:]
    d = len(shape)
    assert d in (2, 3)
    minor = shape[-1]
    assert minor % LANES == 0, "minor axis must be a multiple of 128"

    if d == 2:
        S = minor // LANES
        YS = S
        by = None
        bx = _pick_block(shape[0], block_target_2d)
        grid = (shape[0] // bx,)
        merged_shape = (q, shape[0], S, LANES)
        out_block = (q, bx, S, LANES)
        out_index = lambda i: (0, i, 0, 0)
        slab_rows = YS
        n_dma_x, n_dma_m = 3, 1
    else:
        S = minor // LANES
        assert YHALO % S == 0, "Z/128 must divide 8"
        YS = shape[1] * S
        # by*S must be a multiple of 8 so halo offsets stay tile-aligned
        by = _pick_block(shape[1], block_target[1],
                         multiple=max(1, YHALO // S))
        bx = _pick_block(shape[0], block_target[0])
        grid = (shape[0] // bx, shape[1] // by)
        merged_shape = (q, shape[0], YS, LANES)
        out_block = (q, bx, by * S, LANES)
        out_index = lambda i, j: (0, i, j, 0)
        slab_rows = by * S + 2 * YHALO
        n_dma_x, n_dma_m = 3, 3

    f_packed = f.reshape(merged_shape)

    has_ncm = no_collision_mask is not None
    has_nsm = no_streaming_mask is not None

    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    inputs = [f_packed]
    if has_ncm:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        inputs.append(no_collision_mask.astype(jnp.int32)
                      .reshape(merged_shape[1:]))
    if has_nsm:
        in_specs.append(pl.BlockSpec(out_block, out_index,
                                     memory_space=pltpu.VMEM))
        inputs.append(no_streaming_mask.reshape(merged_shape))

    slab_shape = (q, bx + 2, slab_rows, LANES)
    scratch = [pltpu.VMEM(slab_shape, f.dtype)]
    n_dma = n_dma_x * n_dma_m * (2 if has_ncm else 1)
    if has_ncm:
        scratch.append(pltpu.VMEM((bx + 2, slab_rows, LANES), jnp.int32))
    scratch.append(pltpu.SemaphoreType.DMA((n_dma,)))

    kernel = partial(
        _stream_collide_kernel,
        e=e, w=w, opposite=opposite, cs=cs, tau_inv=tau_inv,
        bx=bx, by=by, S=S, X=shape[0], YS=YS,
        has_ncm=has_ncm, has_nsm=has_nsm,
        boundary_kinds=tuple(boundary_kinds),
        feq_boundary=feq_boundary)

    compiler_params = None
    if vmem_limit_mb is not None:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(out_block, out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(merged_shape, f.dtype),
        scratch_shapes=scratch,
        compiler_params=compiler_params,
        interpret=interpret,
    )(*inputs)
    return out.reshape(f.shape)


def build_fused_step(simulation: "Simulation"):
    """Capability-gated construction of the fused step for a Simulation.

    Raises NotImplementedError when any component cannot run inside the
    kernel; the Simulation then falls back to the jnp path (mirroring the
    reference's native_available probes, ``_simulation.py:100-115``).
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
    if flow.resolution[-1] % LANES != 0:
        raise NotImplementedError("minor axis must be a multiple of 128")
    if d == 3 and YHALO % (flow.resolution[-1] // LANES) != 0:
        raise NotImplementedError("3D minor axis must be in "
                                  "{128, 256, 512, 1024}")

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
    feq_b = []
    for index, boundary in enumerate(simulation.boundaries[1:], start=1):
        if isinstance(boundary, BounceBackBoundary):
            boundary_kinds.append(("bounce_back", index))
            feq_b.append(None)
        elif isinstance(boundary, EquilibriumBoundaryPU):
            if boundary.velocity.ndim > 1:
                raise NotImplementedError("per-node boundary velocity")
            rho = flow.units.convert_pressure_pu_to_density_lu(
                boundary.pressure)
            u = flow.units.convert_velocity_to_lu(boundary.velocity)
            feq = flow.equilibrium(flow, rho=jnp.asarray(rho), u=u)
            feq_b.append(tuple(float(v) for v in np.asarray(feq)))
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
            feq_boundary=tuple(feq_b), interpret=interpret)

    return step
