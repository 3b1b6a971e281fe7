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
  *free* reshape of the public array. The last two dims are large
  multiples of the (8, 128) tile, so vector ops waste no sublanes and all
  block shapes stay tile-aligned;
* **halos as blocked inputs** — the centre block plus its 1-deep x halos
  and 8-row merged-axis halos (and corners) enter as NINE separate blocked
  inputs whose index maps wrap modularly. Pallas's pipeline machinery then
  double-buffers and prefetches every stream concurrently with compute —
  no manual DMA, no semaphores, full overlap;
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
like the reference falls back to its Python step): all seven collision
operators — BGK (incl. Guo/Shan-Chen forced), NoCollision, TRT, MRT
(folded static matvec over any of the four moment transforms),
Regularized, KBC (D2Q9/D3Q27), Smagorinsky — with
QuadraticEquilibrium, BounceBackBoundary and EquilibriumBoundaryPU
(uniform or per-node fields); outlet boundaries ride the kernel via the
hybrid window replay (``hybrid_outlets.py``). The authoritative
capability matrix lives in ``docs/pallas_kernel.md`` ("Capability
gating"); the dispatch itself is ``gate_fused_params`` below.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_fused_step", "build_fused_multi_step",
           "gate_fused_params", "fused_stream_collide"]

LANES = 128
# strong-i32 zero for BlockSpec index-map returns: a python-int literal
# traces as i64 under jax x64 inside shard_map, which Mosaic rejects
_I0 = np.int32(0)
YHALO = 8  # merged-axis halo depth in rows (tile-aligned); S rows are used


def _pick_block(extent: int, target: int, multiple: int = 1) -> int:
    """Largest divisor of ``extent`` that is <= target and a multiple of
    ``multiple``."""
    best = None
    for b in range(1, extent + 1):
        if extent % b == 0 and b % multiple == 0 and b <= target:
            best = b
    return best


def plan_blocks(shape, q: int, dtype,
                block_target: Tuple[int, int] = (16, 32),
                block_target_2d: int = 128,
                yhalo_rows: Optional[int] = None):
    """Pick the kernel's (bx, by, yhalo, S) for a grid shape, or raise
    ``NotImplementedError`` when no tile-aligned split exists (e.g. a prime
    y extent, or y smaller than the halo alignment under bf16) — the
    caller then falls back to the jnp path instead of crashing inside
    ``pallas_call`` grid math. Single source of truth shared by gating and
    the kernel launch."""
    d = len(shape)
    if d not in (2, 3):
        raise NotImplementedError("pallas kernel supports 2D/3D only")
    minor = shape[-1]
    if minor % LANES != 0:
        raise NotImplementedError("minor axis must be a multiple of 128")
    S = minor // LANES
    yhalo = yhalo_rows if yhalo_rows is not None else (
        16 if jnp.dtype(dtype).itemsize == 2 else YHALO)
    if d == 2:
        # cap the output block at ~4 MB so double-buffering fits VMEM at
        # any grid size
        cap = max(8, (4 * 1024 * 1024)
                  // (q * S * LANES * jnp.dtype(dtype).itemsize))
        bx = _pick_block(shape[0], min(block_target_2d, cap))
        return bx, None, yhalo, S
    if yhalo % S != 0:
        raise NotImplementedError(
            f"3D minor axis {minor} is not tile-alignable "
            f"(Z/128 must divide the halo depth {yhalo})")
    if yhalo % 8 != 0:
        # Pallas rejects block shapes whose second-minor dim is not a
        # multiple of 8 rows (real-TPU lowering, any dtype; interpret
        # mode does not check) — the halo blocks are yhalo rows tall
        raise NotImplementedError(
            f"halo depth {yhalo} is not a multiple of the 8-row "
            f"sublane tile")
    # scale the x-block down for larger velocity sets (q > 19) so the
    # slab + pipeline buffers fit the VMEM budget
    bx_target = block_target[0]
    if q > 19:
        bx_target = max(4, bx_target * 19 // q)
    bx = _pick_block(shape[0], bx_target)
    # by*S must be a multiple of yhalo so halo offsets stay aligned
    by = _pick_block(shape[1], block_target[1],
                     multiple=max(1, yhalo // S))
    if by is None:
        raise NotImplementedError(
            f"no tile-aligned y block for extent {shape[1]} "
            f"(needs a divisor that is a multiple of {max(1, yhalo // S)})")
    return bx, by, yhalo, S


class _RollMasks:
    """Hoisted boolean masks shared by every per-q minor-axis roll."""

    def __init__(self, shape, S: int):
        ndim = len(shape)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, ndim - 1)
        self.lane0 = lane == 0
        self.laneL = lane == LANES - 1
        rows = shape[-2]
        if S not in (1, rows):
            row = jax.lax.broadcasted_iota(jnp.int32, shape, ndim - 2)
            s_phase = row % S
            self.s0 = s_phase == 0
            self.sS = s_phase == S - 1


def _roll(x, shift, axis):
    """pltpu.roll with the shift pinned to int32: pltpu.roll lowers to
    tpu.dynamic_rotate, whose shift operand must be i32 — under jax x64
    (f64 state auto-enables it) a plain python int traces as i64 and
    Mosaic rejects the kernel at verification."""
    return pltpu.roll(x, jnp.int32(shift), axis=axis)


def _roll_minor(x, shift: int, S: int, masks: "_RollMasks"):
    """Periodic shift of the minor spatial axis packed as (rows, 128
    lanes), where each z-column group occupies ``S`` consecutive rows. For
    2D pass S == row count (a single group; exact periodic roll)."""
    if shift == 0:
        return x
    rows = x.shape[-2]
    if S == rows:
        if shift == 1:
            a = _roll(x, 1, axis=x.ndim - 1)
            b = _roll(a, 1, axis=x.ndim - 2)
            return jnp.where(masks.lane0, b, a)
        else:
            a = _roll(x, LANES - 1, axis=x.ndim - 1)
            b = _roll(a, rows - 1, axis=x.ndim - 2)
            return jnp.where(masks.laneL, b, a)
    if shift == 1:
        a = _roll(x, 1, axis=x.ndim - 1)
        if S == 1:
            return a  # wrap stays within the row
        b = _roll(a, 1, axis=x.ndim - 2)
        c = _roll(a, rows - (S - 1), axis=x.ndim - 2)
        carry = jnp.where(masks.s0, c, b)
        return jnp.where(masks.lane0, carry, a)
    else:
        a = _roll(x, LANES - 1, axis=x.ndim - 1)
        if S == 1:
            return a
        b = _roll(a, rows - 1, axis=x.ndim - 2)
        c = _roll(a, S - 1, axis=x.ndim - 2)
        carry = jnp.where(masks.sS, c, b)
        return jnp.where(masks.laneL, carry, a)


def _minor_image_fix(x, n: int, depth: int, S_group: int):
    """Rewrite the minor-axis ghost-image bands of an output tile in VMEM.

    With ghost-image padding (``padding.py``, image mode) the padded minor
    extent is ``npad = S_group * 128`` merged positions per z-group; the
    bands ``[n, n+depth)`` and ``[npad-depth, npad)`` must hold periodic
    images of ``[0, depth)`` / ``[n-depth, n)`` for the next launch. Doing
    this on the kernel output costs two lane/row rolls per q — the jnp
    alternative (``dynamic_update_slice`` at a non-128-multiple lane
    offset) forces a full-array relayout pass per launch (measured 8x
    slowdown at 256^3 z=250).

    Consumed positions' sources always lie inside the same z-group, so the
    cyclic rolls are exact there; everything else is left untouched.
    """
    ndim = x.ndim
    rows = x.shape[-2]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, ndim - 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, ndim - 2)
    s_phase = row if S_group == rows else row % S_group
    z = s_phase * LANES + lane
    npad = S_group * LANES

    def flat_roll(r):
        # result[p] = x[p - r] over the flattened (s_phase, lane) axis
        rl, rr = r % LANES, r // LANES
        a = _roll(x, rl, axis=ndim - 1) if rl else x
        b = _roll(a, rr % rows, axis=ndim - 2) if rr % rows else a
        if rl == 0:
            return b
        c = _roll(a, (rr + 1) % rows, axis=ndim - 2)
        return jnp.where(lane < rl, c, b)

    out = jnp.where((z >= n) & (z < n + depth), flat_roll(n), x)
    return jnp.where(z >= npad - depth, flat_roll(npad - n), out)


def _minor_fold(x, n: int, depth: int, S_group: int):
    """Transpose of the minor-axis ghost-image pad, fused into the adjoint
    kernel's output tile: ghost-band cotangents are accumulated onto their
    wrap sources and every ghost position is zeroed.

    The mirror image of :func:`_minor_image_fix` — there sources lie BELOW
    the consumed band (downward rolls stay inside the z-group), here the
    consumed positions are the valid region and their sources lie ABOVE
    (the bands), so the rolls go upward: ``inv_flat_roll(r)[p] = x[p + r]``
    over the flattened (s_phase, lane) axis, exact wherever the source
    stays inside the same z-group — which it does for every consumed
    (valid) position, since band sources satisfy ``p + r < npad``.

    Tile-mode minors (``npad % n == 0``) fold every periodic copy onto the
    first; image mode folds the two ``depth`` bands. Middle-garbage
    positions carry zero cotangent under the zero-ghost invariant (their
    only readers are ghost outputs), so they are simply zeroed."""
    ndim = x.ndim
    rows = x.shape[-2]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, ndim - 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, ndim - 2)
    s_phase = row if S_group == rows else row % S_group
    z = s_phase * LANES + lane
    npad = S_group * LANES
    zero = jnp.zeros_like(x)

    def inv_flat_roll(r):
        # result[p] = x[p + r] over the flattened (s_phase, lane) axis
        rl, rr = r % LANES, r // LANES
        a = _roll(x, (LANES - rl) % LANES, axis=ndim - 1) if rl else x
        b = _roll(a, (rows - rr % rows) % rows, axis=ndim - 2) \
            if rr % rows else a
        if rl == 0:
            return b
        c = _roll(a, (rows - (rr + 1) % rows) % rows, axis=ndim - 2)
        return jnp.where(lane >= LANES - rl, c, b)

    if npad % n == 0:  # tile mode: sum all copies onto the first
        acc = x
        for j in range(1, npad // n):
            acc = acc + inv_flat_roll(j * n)
        return jnp.where(z < n, acc, zero)
    add = jnp.where(z < depth, inv_flat_roll(n), zero) \
        + jnp.where((z >= n - depth) & (z < n), inv_flat_roll(npad - n),
                    zero)
    return jnp.where(z < n, x + add, zero)


# ----------------------------------------------------------------------
# halo-as-blocked-inputs plumbing
# ----------------------------------------------------------------------
def _halo_specs(X: int, YS: int, bx: int, bys: Optional[int],
                lead_q: Optional[int], yhalo: int = YHALO,
                xhalo: int = 1):
    """(block_shape, index_map) pairs for centre + halo streams of an
    ``[q?, X, YS, 128]`` array blocked over x (and the merged axis in 3D).
    Index maps wrap modularly, giving periodic topology for free. Order:
    [(dx, dm)] for dx, dm in (-1, 0, 1) x (-1, 0, 1) — 3D; x only — 2D.
    ``xhalo`` is the x-halo depth in planes (> 1 for temporally-blocked
    multi-step kernels); it must divide bx so halo index maps stay in
    whole blocks.
    """
    q_dims = (lead_q,) if lead_q else ()
    # index-map constants MUST be strong i32: under jax x64 a python-int
    # literal traces as i64 inside shard_map, and Mosaic's transform-func
    # lowering rejects a mixed (i64, i32, ...) func.return
    # (observed: "failed to legalize operation 'func.return'" on v5e)
    q_zeros = (_I0,) if lead_q else ()

    def xb(dx):
        # block index along x for offset dx in {-1, 0, 1}
        if dx == 0:
            return lambda i: i, bx
        # xhalo-wide block at element (i*bx + dx') mod X, indexed in units
        # of xhalo blocks
        # strong-int32 arithmetic: a python-int literal under jax x64
        # (f64 state) promotes the expression to i64, which Mosaic's
        # transform-func lowering cannot convert (infinite recursion in
        # _convert_element_type); the +nblocks keeps the numerator
        # non-negative so the floor-mod is dtype-convention-safe
        ratio = np.int32(bx // xhalo)
        nblocks = np.int32(X // xhalo)
        off = np.int32((-1 if dx == -1 else int(ratio)) + int(nblocks))
        return (lambda i: (i * ratio + off) % nblocks), xhalo

    specs = []
    if bys is None:
        for dx in (-1, 0, 1):
            xi, xs = xb(dx)
            shape = q_dims + (xs, YS, LANES)
            index = (lambda xi: lambda i: q_zeros + (xi(i), _I0, _I0))(xi)
            specs.append(pl.BlockSpec(shape, index,
                                      memory_space=pltpu.VMEM))
        return specs

    nbm = YS // bys

    def mb(dm):
        if dm == 0:
            return lambda j: j, bys
        # yhalo-row block whose element offset is j*bys - yhalo (or + bys),
        # expressed in units of yhalo blocks (bys is a multiple of yhalo)
        ratio = np.int32(bys // yhalo)
        nblocks = np.int32(YS // yhalo)
        off = np.int32((-1 if dm == -1 else int(ratio)) + int(nblocks))
        return (lambda j: (j * ratio + off) % nblocks), yhalo

    for dx in (-1, 0, 1):
        for dm in (-1, 0, 1):
            xi, xs = xb(dx)
            mi, ms = mb(dm)
            shape = q_dims + (xs, ms, LANES)
            index = (lambda xi, mi: lambda i, j:
                     q_zeros + (xi(i), mi(j), _I0))(xi, mi)
            specs.append(pl.BlockSpec(shape, index,
                                      memory_space=pltpu.VMEM))
    return specs


def _store_parts(parts, slab, is3d: bool, bx: int, bys: Optional[int],
                 yhalo: int = YHALO, xhalo: int = 1):
    """Copy centre+halo input blocks into the contiguous slab scratch —
    nine multi-q vector stores instead of per-q concatenations. Works for
    q-leading f slabs (4D) and plain mask slabs (3D)."""
    lead = (slice(None),) if slab.ndim == 4 else ()
    xh = xhalo

    def load(part):
        v = part[:]
        # 16-bit HBM storage with full-precision (f32) slab scratches:
        # one widening convert on fill replaces a per-sub-step convert +
        # sub-tile relayout inside the blocked sweep
        if v.dtype != slab.dtype:
            v = v.astype(slab.dtype)
        return v

    x_slices = [slice(0, xh), slice(xh, xh + bx),
                slice(xh + bx, 2 * xh + bx)]
    if not is3d:
        for xs, part in zip(x_slices, parts):
            slab[lead + (xs,)] = load(part)
        return
    m_slices = [slice(0, yhalo), slice(yhalo, yhalo + bys),
                slice(yhalo + bys, yhalo + bys + yhalo)]
    k = 0
    for xs in x_slices:
        for ms in m_slices:
            slab[lead + (xs, ms)] = load(parts[k])
            k += 1


def build_pair_apply(mat: np.ndarray, opposite: np.ndarray):
    """Static f-space matvec ``out[qi] = sum_c mat[qi][c] v[c]``, HALVED
    via opposite-pair parity when ``mat`` commutes with the opposite
    permutation (then it maps pair-sums to pair-sums and pair-diffs to
    pair-diffs, so the even and odd accumulations are shared between +e
    and -e outputs; verified numerically at build, dense fallback
    otherwise). Used by the folded MRT fragment and, transposed, by the
    adjoint kernel's linear-collision jacobians (ops/pallas/adjoint.py)."""
    nq = mat.shape[0]
    perm = [int(opposite[qi]) for qi in range(nq)]
    selfs = [qi for qi in range(nq) if perm[qi] == qi]
    prs = [(a, perm[a]) for a in range(nq) if a < perm[a]]

    def dot(coeffs, vecs):
        acc = None
        for c, v in zip(coeffs, vecs):
            if c == 0.0 or v is None:
                continue
            t = v if c == 1.0 else v * float(c)
            acc = t if acc is None else acc + t
        return acc

    def apply_dense(vlist):
        return [dot(mat[qi], vlist) for qi in range(nq)]

    if not np.allclose(mat[np.ix_(perm, perm)], mat, atol=1e-11):
        return apply_dense

    # even basis: selfs then pair sums; odd basis: pair diffs
    ce = {qi: [mat[qi][s] for s in selfs]
          + [0.5 * (mat[qi][a] + mat[qi][b]) for a, b in prs]
          for qi in [s for s in selfs] + [a for a, _ in prs]}
    co = {a: [0.5 * (mat[a][x] - mat[a][y]) for x, y in prs]
          for a, _ in prs}

    def apply_pairs(vlist):
        ue = ([vlist[s] for s in selfs]
              + [vlist[a] + vlist[b] for a, b in prs])
        uo = [vlist[a] - vlist[b] for a, b in prs]
        out = [None] * nq
        for s in selfs:
            out[s] = dot(ce[s], ue)
        for a, b in prs:
            ev, od = dot(ce[a], ue), dot(co[a], uo)
            if ev is None:
                out[a], out[b] = od, (None if od is None else -od)
            elif od is None:
                out[a] = out[b] = ev
            else:
                out[a], out[b] = ev + od, ev - od
        return out
    return apply_pairs


def mxu_mode() -> str:
    """The MXU moment-formulation mode for moment-heavy fragments
    (VERDICT r4 #1): "off" (VPU add/sub trees, default), "plane"
    (per-x-plane 2D dots), or "slab" (one whole-slab 2D dot). Set via
    ``LETTUCE_MXU``. Read at trace time; all modes are numerically
    equivalent (tests) — the choice is a throughput knob."""
    import os as _os
    v = _os.environ.get("LETTUCE_MXU", "off").lower()
    return {"0": "off", "1": "plane", "2": "slab"}.get(v, v)


def build_mxu_matrix(spec, e, w, opposite, cs, d) -> Optional[tuple]:
    """(matrix, rows) for the collision specs with an MXU moment
    formulation, or None. ``matrix`` is a float32 numpy array whose rows
    concatenate every static f-space matrix the fragment contracts with
    the populations; it enters ``pallas_call`` as a real input (Pallas
    rejects closed-over array constants). ``rows`` maps a purpose tag to
    its [r0, r1) row range."""
    kind = spec[0]
    q = e.shape[0]
    e_f = np.asarray(e, dtype=np.float64)
    if kind == "mrt" and spec[4] == "from_feq":
        M_np = np.asarray(spec[1], dtype=np.float64)
        Minv_np = np.asarray(spec[2], dtype=np.float64)
        s_np = 1.0 / np.asarray([float(t) for t in spec[3]],
                                dtype=np.float64)
        C = Minv_np @ (s_np[:, None] * M_np)
        return C.astype(np.float32), {"C": (0, q)}
    if kind == "reg":
        w_f = np.asarray(w, dtype=np.float64)
        cs2 = cs * cs
        G = e_f @ e_f.T
        P = (G * G - cs2 * (e_f * e_f).sum(axis=1)[None, :]) \
            * (w_f[:, None] / (2.0 * cs2 * cs2))
        Pk = (1.0 - 1.0 / float(spec[1])) * P
        return Pk.astype(np.float32), {"P": (0, q)}
    if kind == "kbc":
        comps = [(a, b) for a in range(d) for b in range(a, d)]
        M2 = np.array([[e_f[qi, a] * e_f[qi, b] for qi in range(q)]
                       for (a, b) in comps])
        return M2.astype(np.float32), {"M2": (0, len(comps)),
                                       "comps": comps}
    return None


def _mxu_dot(mref, r0: int, r1: int, rhs, mode: str):
    """(r1-r0, q) x (q, *spatial) contraction on the MXU. ``rhs`` is the
    stacked populations (q, X, R, L); returns (r1-r0, X, R, L)."""
    n = r1 - r0
    mat = mref[r0:r1]
    if mat.dtype != rhs.dtype:
        mat = mat.astype(rhs.dtype)
    dims = (((1,), (0,)), ((), ()))
    if mode == "slab":
        flat = rhs.reshape(rhs.shape[0], -1)
        out = jax.lax.dot_general(mat, flat, dims,
                                  preferred_element_type=jnp.float32)
        return out.reshape((n,) + rhs.shape[1:])
    outs = []
    for x in range(rhs.shape[1]):
        plane = rhs[:, x].reshape(rhs.shape[0], -1)
        o = jax.lax.dot_general(mat, plane, dims,
                                preferred_element_type=jnp.float32)
        outs.append(o.reshape((n,) + rhs.shape[2:]))
    return jnp.stack(outs, axis=1)


def _make_collide(spec, e, w, opposite, cs, d, rho, u, u2, read,
                  dev_storage, mxu=None):
    """Build the per-q post-collision function for a collision spec.

    Each collision operator is a *kernel fragment*: a closure producing
    fpost(qi) from the slab populations and the precomputed moments — the
    Pallas analog of the reference's NativeCollision emitters
    (``cuda_native/ext/_collision/``). All fragments work in deviation
    form too: every formula below is shift-invariant in f -> f - w except
    KBC's feq division, which reconstructs true values with one constant
    add.

    Specs: ("none",) | ("bgk", tau_inv) |
    ("bgk_force", tau_inv, accel, k_ueq, src_pref) |
    ("trt", tau_plus, tau_minus) | ("reg", tau) | ("smag", tau, C) |
    ("kbc", tau).
    """
    q = e.shape[0]
    cs2 = cs * cs
    kind = spec[0]

    if kind == "none":
        return read

    up = [uc * (1.0 / cs2) for uc in u]

    def canonical(qi):
        row = [int(c) for c in e[qi]]
        for c in row:
            if c > 0:
                return tuple(row)
            if c < 0:
                return tuple(-x for x in row)
        return tuple(row)

    def eu_of(qi):
        acc = None
        for comp, uc in zip(e[qi], up):
            if comp == 0:
                continue
            term = uc if comp == 1 else -uc
            acc = term if acc is None else acc + term
        return acc

    if kind == "bgk":
        # specialised: feq pre-multiplied by tau_inv, fpost = keep f + t feq.
        # Opposite pairs share everything but the eu sign (w[q] == w[opp]
        # for every standard stencil), so the whole weighted equilibrium is
        # cached per canonical direction as (G, H) with
        #   G = w (base + quad),  H = w trho eu_canonical
        # and the steady per-q work collapses to keep*f + (G +- H).
        tau_inv = spec[1]
        keep = 1.0 - tau_inv
        base = tau_inv * (rho - rho * (u2 * (0.5 / cs2)))
        if dev_storage:
            base = base - tau_inv
        trho = tau_inv * rho
        wbase_cache = {}
        pair_cache = {}

        def eu_canon(key):
            acc = None
            for comp, uc in zip(key, up):
                if comp == 0:
                    continue
                term = uc if comp == 1 else -uc
                acc = term if acc is None else acc + term
            return acc

        def fpost_bgk(qi):
            fi = read(qi)
            row = tuple(int(c) for c in e[qi])
            wq = float(w[qi])
            if not any(row):
                return keep * fi + wq * base
            key = canonical(qi)
            gh = pair_cache.get(key)
            if gh is None:
                eu = eu_canon(key)
                teu = trho * eu
                H = wq * teu
                quad_w = (0.5 * wq) * (teu * eu)
                wb = wbase_cache.get(wq)
                if wb is None:
                    wb = wq * base
                    wbase_cache[wq] = wb
                gh = (wb + quad_w, H)
                pair_cache[key] = gh
            G, H = gh
            feq_t = G + H if row == key else G - H
            return keep * fi + feq_t
        return fpost_bgk

    if kind == "bgk_force":
        # BGK with a uniform-acceleration forcing scheme (Guo / Shan-Chen):
        # velocity shift u_f = u + k a / rho applied inside feq, plus (Guo)
        # the pointwise source S_i — all per-node algebra, so it fits the
        # fragment protocol. The reference's native path has no forcing at
        # all (cuda_native/ext/_force/_force.py).
        _, tau_inv, accel, k_ueq, src_pref = spec
        keep = 1.0 - tau_inv
        inv_rho = 1.0 / rho
        uf = [uc + (k_ueq * float(ac)) * inv_rho
              for uc, ac in zip(u, accel)]
        u2f = None
        for uc in uf:
            u2f = uc * uc if u2f is None else u2f + uc * uc
        upf = [uc * (1.0 / cs2) for uc in uf]

        def euf_of(qi):
            acc = None
            for comp, uc in zip(e[qi], upf):
                if comp == 0:
                    continue
                term = uc if comp == 1 else -uc
                acc = term if acc is None else acc + term
            return acc

        base = tau_inv * (rho - rho * (u2f * (0.5 / cs2)))
        if dev_storage:
            base = base - tau_inv
        trho = tau_inv * rho
        # same opposite-pair (G, H) caching as the plain BGK fragment; eu
        # flips sign across the pair, so the cached quad/source pieces are
        # keyed by the canonical direction and combined as G +- H
        wbase_cache = {}
        pair_cache = {}

        ua = None  # u_f . a
        if src_pref is not None:
            for uc, ac in zip(uf, accel):
                if float(ac) == 0.0:
                    continue
                term = uc * float(ac)
                ua = term if ua is None else ua + term
            if ua is None:
                ua = 0.0

        def fpost_bgk_force(qi):
            fi = read(qi)
            row = tuple(int(c) for c in e[qi])
            wq = float(w[qi])
            eu = euf_of(qi)
            if eu is None:
                out = keep * fi + wq * base
                if src_pref is not None:
                    out = out - (src_pref * wq / cs2) * ua
                return out
            key = canonical(qi)
            gh = pair_cache.get(key)
            if gh is None:
                # compute for the canonical orientation: eu_canon flips
                # sign when this qi is the anti-canonical member
                eu_c = eu if row == key else -eu
                teu = trho * eu_c
                H = wq * teu
                quad_w = (0.5 * wq) * (teu * eu_c)
                wb = wbase_cache.get(wq)
                if wb is None:
                    wb = wq * base
                    wbase_cache[wq] = wb
                G = wb + quad_w
                if src_pref is not None:
                    coef = src_pref * wq / cs2
                    ea_c = 0.0
                    for comp, ac in zip(key, accel):
                        ea_c += float(comp) * float(ac)
                    # source split into pair-even / pair-odd parts:
                    # si = coef(-ua + ea eu) + coef ea  (ea, eu flip sign)
                    G = G - coef * ua
                    if ea_c != 0.0:
                        G = G + (coef * ea_c) * eu_c
                        H = H + coef * ea_c
                gh = (G, H)
                pair_cache[key] = gh
            G, H = gh
            return keep * fi + (G + H if row == key else G - H)
        return fpost_bgk_force

    # raw (not tau-scaled) equilibrium shared by the remaining fragments;
    # same opposite-pair (G, H) caching as the BGK fragment
    base0 = rho - rho * (u2 * (0.5 / cs2))
    if dev_storage:
        base0 = base0 - 1.0
    wbase_cache0 = {}
    pair_cache0 = {}

    def feq_raw(qi):
        row = tuple(int(c) for c in e[qi])
        wq = float(w[qi])
        if not any(row):
            return wq * base0
        key = canonical(qi)
        gh = pair_cache0.get(key)
        if gh is None:
            acc = None
            for comp, uc in zip(key, up):
                if comp == 0:
                    continue
                term = uc if comp == 1 else -uc
                acc = term if acc is None else acc + term
            reu = rho * acc
            H = wq * reu
            quad_w = (0.5 * wq) * (reu * acc)
            wb = wbase_cache0.get(wq)
            if wb is None:
                wb = wq * base0
                wbase_cache0[wq] = wb
            gh = (wb + quad_w, H)
            pair_cache0[key] = gh
        G, H = gh
        return G + H if row == key else G - H

    if kind == "trt":
        _, tau_plus, tau_minus = spec
        cp, cm = 0.5 / tau_plus, 0.5 / tau_minus
        trt_cache = {}

        def fpost_trt(qi):
            # the relaxed symmetric/antisymmetric parts are shared between
            # +e and -e explicitly (Mosaic does not CSE commuted adds)
            qo = int(opposite[qi])
            key = (qi, qo) if qi <= qo else (qo, qi)
            parts = trt_cache.get(key)
            if parts is None:
                fa, fb = read(key[0]), read(key[1])
                fea, feb = feq_raw(key[0]), feq_raw(key[1])
                sp = cp * ((fa + fb) - (fea + feb))
                sm = cm * ((fa - fb) - (fea - feb))
                parts = trt_cache[key] = (sp, sm)
            sp, sm = parts
            return (read(qi) - sp - sm if qi == key[0]
                    else read(qi) - sp + sm)
        return fpost_trt

    if kind == "reg":
        if mxu is not None and "P" in mxu["rows"]:
            # MXU formulation: g = P' fneq as ONE static (q, q) dot on
            # the systolic array (P' = (1 - 1/tau) P), freeing the VPU
            # for the equilibrium polynomial
            F = mxu["read_all"]()
            feqs = jnp.stack([feq_raw(qi) for qi in range(q)])
            r0, r1 = mxu["rows"]["P"]
            G = _mxu_dot(mxu["ref"], r0, r1, F - feqs, mxu["mode"])

            def fpost_reg_mxu(qi):
                return feqs[qi] + G[qi]
            return fpost_reg_mxu
        # rank-d(d+1)/2 moment-space factorisation of the projection
        # f' = feq + (1 - 1/tau) P fneq (Latt-Chopard, reference
        # ``regularized_collision.py:8-50``). P = W Q : Q^T / (2 cs4)
        # factors exactly through the symmetric second-moment space:
        #   Pi_ab = sum_j e_ja e_jb fneq_j          (raw moments, M1)
        #   g_i   = k w_i / (2 cs4) * Q_i : Pi       (reconstruct, M2)
        #   f'_i  = feq_i + g_i
        # Both matrices are even under e -> -e so everything runs on the
        # 1 + (q-1)/2 opposite-pair sums and g is shared within a pair.
        # M1's coefficients are all in {-1, 0, 1} (pure adds). ~175 ops
        # per cell at q=27 vs ~417 for the dense pair-folded q x q
        # matvec this replaces (2648 MLUPS at D3Q27 256^3, VPU-bound at
        # ~1.9 TFLOP/s; the fold itself had replaced a 1901-MLUPS form).
        kk = 1.0 - 1.0 / float(spec[1])
        e_f = np.asarray(e, dtype=np.float64)
        w_f = np.asarray(w, dtype=np.float64)
        selfs = [qi for qi in range(q) if int(opposite[qi]) == qi]
        prs = [(a, int(opposite[a])) for a in range(q)
               if a < int(opposite[a])]
        reps = selfs + [a for a, _ in prs]
        comps = [(a, b) for a in range(d) for b in range(a, d)]
        # moments from pair sums; reconstruction back to representatives
        M1 = np.array([[e_f[r, a] * e_f[r, b] for r in reps]
                       for (a, b) in comps])
        M2 = np.array([[(w_f[r] * kk / (2.0 * cs2 * cs2))
                        * (e_f[r, a] * e_f[r, b] - (cs2 if a == b else 0.0))
                        * (2.0 if a != b else 1.0)
                        for (a, b) in comps] for r in reps])

        def sdot(coeffs, vecs):
            acc = None
            for c, v in zip(coeffs, vecs):
                if c == 0.0 or v is None:
                    continue
                t = v if c == 1.0 else (-v if c == -1.0 else v * float(c))
                acc = t if acc is None else acc + t
            return acc

        fneq = [read(qi) - feq_raw(qi) for qi in range(q)]
        ue = ([fneq[s] for s in selfs]
              + [fneq[a] + fneq[b] for a, b in prs])
        mom = [sdot(M1[ci], ue) for ci in range(len(comps))]
        g = {}
        for ri, r in enumerate(reps):
            g[r] = sdot(M2[ri], mom)
        for a, b in prs:
            g[b] = g[a]  # Q is even: the projection output pairs up

        def fpost_reg(qi):
            gi = g[qi]
            return feq_raw(qi) if gi is None else feq_raw(qi) + gi
        return fpost_reg

    if kind == "smag":
        tau = spec[1]
        # Pi_neq_ab = sum_q e_a e_b (f_q - feq_q), symmetric d x d
        pairs = [(a, b) for a in range(d) for b in range(a, d)]
        Pi = {p: None for p in pairs}
        for qi in range(q):
            coeffs = {}
            for (a, b) in pairs:
                c = int(e[qi, a]) * int(e[qi, b])
                if c:
                    coeffs[(a, b)] = c
            if not coeffs:
                continue
            fneq = read(qi) - feq_raw(qi)
            for p, c in coeffs.items():
                term = fneq if c == 1 else -fneq
                Pi[p] = term if Pi[p] is None else Pi[p] + term

        # smagorinsky: effective tau field by 2-step fixed point
        _, tau, const = spec
        nu = (tau - 0.5) / 3.0
        inv2rhocs2 = 1.0 / (2.0 * cs2) / rho
        S_shear = {p: (Pi[p] * inv2rhocs2 if Pi[p] is not None else None)
                   for p in pairs}
        tau_eff = tau
        for _i in range(2):
            ssum = None
            for (a, b) in pairs:
                if S_shear[(a, b)] is None:
                    continue
                t2 = (S_shear[(a, b)] / tau_eff) ** 2
                if a != b:
                    t2 = t2 * 2.0  # full-tensor sum counts both triangles
                ssum = t2 if ssum is None else ssum + t2
            nu_t = const * const * ssum
            tau_eff = (nu + nu_t) * 3.0 + 0.5
        tau_eff_inv = 1.0 / tau_eff

        def fpost_smag(qi):
            fi = read(qi)
            return fi - tau_eff_inv * (fi - feq_raw(qi))
        return fpost_smag

    if kind == "mrt":
        # folded static-matrix multi-relaxation. Instead of the three
        # matvecs m = M f, relax, f' = Minv m (the jnp path's shape), the
        # fragment precomputes C = Minv diag(1/tau) M in f64 and applies
        #   from_feq:  f' = f - C (f - feq)          (exact algebra)
        #   analytic:  f' = f - C f + A meq(rho, j)  (A = Minv diag(1/tau))
        # — one static matvec per term. Each matvec is then HALVED via
        # opposite-pair parity: every generated moment row has definite
        # parity under q -> qbar, so C commutes with the opposite
        # permutation and maps pair-sums to pair-sums / pair-diffs to
        # pair-diffs; the even and odd accumulations are shared between
        # +e and -e outputs (verified numerically at build, dense
        # fallback otherwise). spec = ("mrt", M, Minv, taus, meq_kind).
        _, M_t, Minv_t, taus, meq_kind = spec
        M_np = np.asarray(M_t, dtype=np.float64)
        Minv_np = np.asarray(Minv_t, dtype=np.float64)
        s_np = 1.0 / np.asarray([float(t) for t in taus], dtype=np.float64)
        nq = M_np.shape[0]
        C_np = Minv_np @ (s_np[:, None] * M_np)
        perm = [int(opposite[qi]) for qi in range(nq)]

        apply_C = build_pair_apply(C_np, opposite)

        if meq_kind == "from_feq":
            if mxu is not None and "C" in mxu["rows"]:
                # MXU formulation: C (f - feq) as one static (q, q) dot
                F = mxu["read_all"]()
                feqs = jnp.stack([feq_raw(qi) for qi in range(nq)])
                r0, r1 = mxu["rows"]["C"]
                CD = _mxu_dot(mxu["ref"], r0, r1, F - feqs, mxu["mode"])

                def fpost_mrt_mxu(qi):
                    return read(qi) - CD[qi]
                return fpost_mrt_mxu
            # exact image of the quadratic equilibrium (D3Q19 d'Humieres):
            # f - feq is shift-invariant, so this form composes with
            # deviation storage as-is
            cdf = apply_C([read(qi) - feq_raw(qi) for qi in range(nq)])

            def fpost_mrt(qi):
                return read(qi) - (cdf[qi] if cdf[qi] is not None else 0.0)
            return fpost_mrt

        # analytic equilibrium moments (utils.moments formulas), computed
        # from the prelude's rho/u (== m[0], m[1..d]/rho exactly); gated
        # off under deviation storage (meq is not shift-invariant, and
        # C f below reads raw populations)
        if dev_storage:
            raise NotImplementedError(
                "analytic-moment MRT fragment under deviation storage")
        j = [rho * uc for uc in u]
        jx = j[0]
        if meq_kind == "lallemand":
            jy = j[1]
            j2 = jx * jx + jy * jy
            meq = [rho, jx, jy,
                   (1.0 / 3.0) * (jx * jx - jy * jy),
                   (1.0 / 3.0) * (jx * jy),
                   -2.0 * rho + 3.0 * j2,
                   -jx, -jy,
                   rho - 3.0 * j2]
        elif meq_kind == "dellar":
            jy = j[1]
            inv_r = 1.0 / rho
            meq = [rho, jx, jy,
                   jx * jx * inv_r * 4.5,
                   jx * jy * inv_r * 9.0,
                   jy * jy * inv_r * 4.5,
                   None, None, None]
        elif meq_kind == "hermite27":
            # tensor-Hermite equilibrium moments: products of momenta over
            # rho^(order-1) (utils.moments.D3Q27Hermite.equilibrium). The
            # reference's native path has no MRT at all.
            from ...utils.moments import _HERMITE_MULTIINDICES
            jy, jz = j[1], j[2]
            inv_r = 1.0 / rho
            comp = [jx, jy, jz]
            sq = [None, None, None]
            inv_pow = {0: None, 1: inv_r}
            for n in (2, 3, 4, 5):
                inv_pow[n] = inv_pow[n - 1] * inv_r
            meq = [rho, jx, jy, jz]
            for idx in _HERMITE_MULTIINDICES[4:]:
                order = sum(idx)
                val = None
                for a, n in enumerate(idx):
                    if n == 0:
                        continue
                    if n == 2 and sq[a] is None:
                        sq[a] = comp[a] * comp[a]
                    fct = comp[a] if n == 1 else sq[a]
                    val = fct if val is None else val * fct
                meq.append(val * inv_pow[order - 1])
        else:
            raise NotImplementedError(meq_kind)

        # A meq with A = Minv diag(1/tau): parity of moment k under
        # q -> qbar makes A's columns pair up the same way, so the even
        # (p_k = +1) and odd (p_k = -1) accumulations are shared per pair
        A_np = Minv_np * s_np[None, :]
        p_k = np.zeros(nq)
        for k in range(nq):
            row = M_np[k][perm]
            if np.allclose(row, M_np[k], atol=1e-11):
                p_k[k] = 1.0
            elif np.allclose(row, -M_np[k], atol=1e-11):
                p_k[k] = -1.0

        cf = apply_C([read(qi) for qi in range(nq)])
        g = [None] * nq
        if np.all(p_k != 0.0) and np.allclose(
                A_np[perm], A_np * p_k[None, :], atol=1e-11):
            even_k = [k for k in range(nq) if p_k[k] > 0]
            odd_k = [k for k in range(nq) if p_k[k] < 0]

            def dot_k(qi, ks):
                acc = None
                for k in ks:
                    c, v = float(A_np[qi][k]), meq[k]
                    if c == 0.0 or v is None:
                        continue
                    t = v if c == 1.0 else v * c
                    acc = t if acc is None else acc + t
                return acc

            for qi in range(nq):
                if perm[qi] < qi:
                    continue
                ev, od = dot_k(qi, even_k), dot_k(qi, odd_k)
                g[qi] = (ev if od is None else
                         od if ev is None else ev + od)
                if perm[qi] != qi:
                    g[perm[qi]] = (ev if od is None else
                                   -od if ev is None else ev - od)
        else:  # pragma: no cover - all generated transforms have parity
            for qi in range(nq):
                acc = None
                for k in range(nq):
                    c, v = float(A_np[qi][k]), meq[k]
                    if c == 0.0 or v is None:
                        continue
                    t = v if c == 1.0 else v * c
                    acc = t if acc is None else acc + t
                g[qi] = acc

        def fpost_mrt(qi):
            out = read(qi)
            if cf[qi] is not None:
                out = out - cf[qi]
            if g[qi] is not None:
                out = out + g[qi]
            return out
        return fpost_mrt

    if kind == "kbc":
        # The fragment is VPU-compute-bound (BGK at the same stencil is
        # 3x faster), so every piece of per-site algebra below is
        # organised around opposite-direction PAIRS: e.u sums, feq
        # polynomials, 1/feq reciprocals and the raw second moments are
        # all shared between +e and -e. Measured D3Q27 256^3 history:
        # 2008 MLUPS (per-direction s_f/s_eq), 2669 (moment-delta form),
        # this form adds pair sharing + grouped stabiliser sums.
        tau = spec[1]
        beta = 1.0 / (2.0 * tau)
        w_np = w
        inv_rho = 1.0 / rho

        # opposite-direction pair structure: (qp, qm) with canonical(qp)
        # == tuple(e[qp]); the rest direction pairs with itself
        pairs = []
        rest = None
        seen = set()
        for qi in range(q):
            if qi in seen:
                continue
            qo = int(opposite[qi])
            seen.update((qi, qo))
            if qo == qi:
                rest = qi
            elif canonical(qi) == tuple(int(c) for c in e[qi]):
                pairs.append((qi, qo))
            else:
                pairs.append((qo, qi))

        # e.u/cs2 for every canonical direction, built incrementally
        # (corner sums reuse edge sums: 12 adds for all of D3Q27 vs 28
        # when each direction re-sums its components)
        if d == 3:
            ux, uy, uz = up
            sxy, dxy = ux + uy, ux - uy
            eu_c = {(1, 0, 0): ux, (0, 1, 0): uy, (0, 0, 1): uz,
                    (1, 1, 0): sxy, (1, -1, 0): dxy,
                    (1, 0, 1): ux + uz, (1, 0, -1): ux - uz,
                    (0, 1, 1): uy + uz, (0, 1, -1): uy - uz,
                    (1, 1, 1): sxy + uz, (1, 1, -1): sxy - uz,
                    (1, -1, 1): dxy + uz, (1, -1, -1): dxy - uz}
        elif d == 2:
            ux, uy = up
            eu_c = {(1, 0): ux, (0, 1): uy,
                    (1, 1): ux + uy, (1, -1): ux - uy}
        else:
            raise NotImplementedError("KBC fragment needs d in (2, 3)")

        # quadratic feq in pair form: feq(+-e) = w*(C +- rho*(e.u)/cs2)
        # with C = rho - rho*u^2/2cs2 + rho*(e.u)^2/2cs4 (+1 in deviation
        # storage, folding the add_w shift into the polynomial)
        c_shift = base0 + 1.0 if dev_storage else base0
        feq_t = {}
        if rest is not None:
            feq_t[rest] = float(w_np[rest]) * c_shift
        for qp, qm in pairs:
            eu = eu_c[canonical(qp)]
            re = rho * eu
            c_eff = c_shift + re * (eu * 0.5)
            wq = float(w_np[qp])  # opposite directions share the weight
            feq_t[qp] = wq * (c_eff + re)
            feq_t[qm] = wq * (c_eff - re)

        # 1/feq by opposite-pair conjugation: 1/feq(+e) =
        # feq(-e)/(feq(+e)*feq(-e)) — one reciprocal per PAIR instead
        # of per direction (27 -> 14 on D3Q27; divides are the VPU's
        # most expensive primitive here). The reciprocal itself uses the
        # TPU's approximate-reciprocal unit refined by one Newton step
        # (rel err ~1e-5, only feeds the gamma stabiliser) instead of a
        # full-precision divide; f32 only — other dtypes keep the divide.
        if getattr(rho, "dtype", None) == jnp.float32:
            def _recip(x):
                y = pl.reciprocal(x, approx=True)
                return y * (2.0 - x * y)
        else:
            def _recip(x):
                return 1.0 / x
        recip_feq = {}
        if rest is not None:
            recip_feq[rest] = _recip(feq_t[rest])
        for qp, qm in pairs:
            invpm = _recip(feq_t[qp] * feq_t[qm])
            recip_feq[qp] = feq_t[qm] * invpm
            recip_feq[qm] = feq_t[qp] * invpm

        # raw second moments sum e^a e^b f from pair sums f(+e)+f(-e)
        # (e^a e^b is even in e: 13 pair adds replace ~17 adds PER
        # moment). Dev shift: sum w e_a e_b = cs2 diagonal, 0 mixed.
        # MXU mode: all d(d+1)/2 moments as one static dot instead.
        if mxu is not None and "M2" in mxu["rows"]:
            F_all = mxu["read_all"]()
            r0, r1 = mxu["rows"]["M2"]
            M2out = _mxu_dot(mxu["ref"], r0, r1, F_all, mxu["mode"])
            m_comps = mxu["rows"]["comps"]

            def second_moment(a, b):
                ci = m_comps.index((a, b) if a <= b else (b, a))
                return M2out[ci] * inv_rho
        else:
            pair_sum = {(qp, qm): read(qp) + read(qm) for qp, qm in pairs}

            def second_moment(a, b):
                acc = None
                for (qp, qm), s in pair_sum.items():
                    cc = int(e[qp, a]) * int(e[qp, b])
                    if cc == 0:
                        continue
                    term = s if cc == 1 else -s
                    acc = term if acc is None else acc + term
                return acc * inv_rho

        # s(qi) is LINEAR in the (T, N, P) moment set, so
        # delta_s(qi) = s applied to the moment DELTAS; paired directions
        # share the value. ds_index maps qi -> (group, sign) so the
        # stabiliser sum and fpost can fold signs into adds/subs instead
        # of materialising negated tracers.
        if d == 3:
            m200 = second_moment(0, 0)
            m020 = second_moment(1, 1)
            m002 = second_moment(2, 2)
            if dev_storage:
                m200 = m200 + cs2 * inv_rho
                m020 = m020 + cs2 * inv_rho
                m002 = m002 + cs2 * inv_rho
            # moment deltas f - eq (quadratic equilibrium on D3Q27:
            # m_ab(feq)/rho = u_a u_b + cs2 delta_ab)
            dT = (m200 + m020 + m002) - (u2 + 3 * cs2)
            dNxz = (m200 - m002) - (u[0] * u[0] - u[2] * u[2])
            dNyz = (m020 - m002) - (u[1] * u[1] - u[2] * u[2])
            dPxy = second_moment(0, 1) - u[0] * u[1]
            dPxz = second_moment(0, 2) - u[0] * u[2]
            dPyz = second_moment(1, 2) - u[1] * u[2]
            r6 = rho * (1. / 6.)
            ds_groups = {
                "T": rho * -dT,
                "x": r6 * (2 * dNxz - dNyz + dT),
                "y": r6 * (2 * dNyz - dNxz + dT),
                "z": r6 * (-dNxz - dNyz + dT),
                "yz": 0.25 * rho * dPyz,
                "xz": 0.25 * rho * dPxz,
                "xy": 0.25 * rho * dPxy,
            }
            ds_index = {0: ("T", 1), 1: ("x", 1), 2: ("x", 1),
                        3: ("y", 1), 4: ("y", 1), 5: ("z", 1),
                        6: ("z", 1), 7: ("yz", 1), 8: ("yz", 1),
                        9: ("yz", -1), 10: ("yz", -1), 11: ("xz", 1),
                        12: ("xz", 1), 13: ("xz", -1), 14: ("xz", -1),
                        15: ("xy", 1), 16: ("xy", 1), 17: ("xy", -1),
                        18: ("xy", -1)}
        else:
            m20 = second_moment(0, 0)
            m02 = second_moment(1, 1)
            if dev_storage:
                m20 = m20 + cs2 * inv_rho
                m02 = m02 + cs2 * inv_rho
            dT = (m20 + m02) - (u2 + 2 * cs2)
            dN = (m20 - m02) - (u[0] * u[0] - u[1] * u[1])
            dPxy = second_moment(0, 1) - u[0] * u[1]
            r4 = 0.25 * rho
            ds_groups = {"T": rho * -dT, "p": r4 * (dT + dN),
                         "m": r4 * (dT - dN), "xy": r4 * dPxy}
            ds_index = {0: ("T", 1), 1: ("p", 1), 3: ("p", 1),
                        2: ("m", 1), 4: ("m", 1), 5: ("xy", 1),
                        7: ("xy", 1), 6: ("xy", -1), 8: ("xy", -1)}

        # gamma stabiliser: sum_s = sum ds*dh/feq, sum_h = sum dh^2/feq.
        # sum_s is accumulated GROUPED: directions sharing a ds tracer
        # first sum their signed dh/feq, then one multiply per group
        # (7 muls on D3Q27 instead of 19). dh tracers are kept and
        # REUSED by fpost_kbc below — tracer reuse is jaxpr-level
        # sharing, so each is computed once in the compiled fragment.
        dh_cache = {}
        group_acc = {}
        sum_h = None
        for qi in range(q):
            # feq_t is the TRUE equilibrium (the dev shift is folded into
            # c_shift), so the population must be un-shifted to match
            f_t = read(qi) + float(w_np[qi]) if dev_storage else read(qi)
            idx = ds_index.get(qi)
            if idx is None:
                dh = f_t - feq_t[qi]
            else:
                g, sgn = idx
                ds_g = ds_groups[g]
                dh = (f_t - feq_t[qi] - ds_g if sgn == 1
                      else f_t - feq_t[qi] + ds_g)
            dh_cache[qi] = dh
            dh_over_feq = dh * recip_feq[qi]
            if idx is not None:
                g, sgn = idx
                prev = group_acc.get(g)
                if prev is None:
                    group_acc[g] = (dh_over_feq if sgn == 1
                                    else -dh_over_feq)
                else:
                    group_acc[g] = (prev + dh_over_feq if sgn == 1
                                    else prev - dh_over_feq)
            term_h = dh * dh_over_feq
            sum_h = term_h if sum_h is None else sum_h + term_h
        sum_s = None
        for g, acc in group_acc.items():
            term = ds_groups[g] * acc
            sum_s = term if sum_s is None else sum_s + term

        inv_beta = 1.0 / beta
        gamma = inv_beta - (2.0 - inv_beta) * sum_s / sum_h
        gamma = jnp.where(gamma < 1e-15, 2.0, gamma)
        gamma = jnp.where(jnp.isnan(gamma), 2.0, gamma)

        # fpost = f - beta*(2 ds + gamma dh) = f - bg*dh -+ tb_g with
        # bg = beta*gamma shared and tb_g = 2*beta*ds_g one multiply per
        # GROUP (the per-direction form re-multiplied beta into every
        # direction)
        bg = beta * gamma
        tb = {g: (2.0 * beta) * v for g, v in ds_groups.items()}

        def fpost_kbc(qi):
            # in deviation storage f_t - w == read(qi): the shifts cancel
            # between f_t and dh, so raw reads are correct in both modes
            f_dev = read(qi)
            idx = ds_index.get(qi)
            core = f_dev - bg * dh_cache[qi]
            if idx is None:
                return core
            g, sgn = idx
            return core - tb[g] if sgn == 1 else core + tb[g]
        return fpost_kbc

    raise NotImplementedError(kind)


def _moments(read, q: int, e: np.ndarray, d: int, dev_storage: bool):
    """rho, u, u2 as add/sub trees over the populations (e components in
    {-1, 0, 1}: no multiplies). Opposite pairs are folded first: rho rides
    the pair sums (one add per pair instead of two) and each j component
    rides the pair diffs (|e_a| = 1 on at most d of the q directions), so
    D3Q19 takes 39 adds instead of 45."""
    idx = {tuple(int(c) for c in e[qi]): qi for qi in range(q)}
    rho = None
    j = [None] * d
    seen = set()
    for qi in range(q):
        row = tuple(int(c) for c in e[qi])
        if not any(row):
            fi = read(qi)
            rho = fi if rho is None else rho + fi
            continue
        if qi in seen:
            continue
        opp = idx[tuple(-c for c in row)]
        seen.add(qi)
        seen.add(opp)
        fa = read(qi)
        fb = read(opp)
        s = fa + fb
        dif = fa - fb
        rho = s if rho is None else rho + s
        for a in range(d):
            if e[qi, a] == 1:
                j[a] = dif if j[a] is None else j[a] + dif
            elif e[qi, a] == -1:
                j[a] = -dif if j[a] is None else j[a] - dif
    if dev_storage:
        rho = rho + 1.0
    inv_rho = 1.0 / rho
    u = [ja * inv_rho for ja in j]
    u2 = None
    for uc in u:
        u2 = uc * uc if u2 is None else u2 + uc * uc
    return rho, u, u2


def _multi_sweep(slab, slab2, out_ref, spec, e, w, opposite, cs, d,
                 bx, S, yhalo, n_sub, is3d, compute_dtype, dev_storage,
                 ncm_slab_ref=None, feq_slab_ref=None,
                 boundary_kinds=(), feq_boundary=None, minor_image=None,
                 nsm_slab_ref=None, mxu_ref=None, mxu_rows=None,
                 mxu_dot_mode: str = "off"):
    """Temporally-blocked sweep: run ``n_sub`` collide-and-stream
    sub-steps entirely in VMEM, ping-ponging between two slab scratches.

    Pull streaming in-slab: the minor (z) shift is a periodic lane roll
    (exact — z is complete in the slab); x and merged-y shifts are plain
    slices, so the valid region shrinks by one x plane and S merged rows
    per sub-step. The input halo is sized so the final sub-step's valid
    region covers exactly the output block. Anything outside the valid
    region is garbage that is computed but never consumed — the z-roll
    carry logic stays within one S-row group, so garbage cannot leak
    across the valid boundary (group boundaries are multiples of S).

    Mask-coded boundaries (bounce back / equilibrium) are pointwise
    pre-streaming replacements, so they apply per sub-step on the slab
    exactly as the single-step kernel applies them on its block; frozen
    populations (``nsm_slab_ref``) are likewise destination-pointwise
    selects, applied per sub-step in slab coordinates.
    """
    q = e.shape[0]
    slabs = [slab, slab2]
    X_s = slab.shape[1]
    R_s = slab.shape[2]
    roll_masks = _RollMasks((X_s, R_s, LANES), S if is3d else R_s)
    ncm = ncm_slab_ref[:] if ncm_slab_ref is not None else None

    def read_feq_field(qi):
        v = feq_slab_ref[qi]
        if v.dtype != compute_dtype:
            v = v.astype(compute_dtype)
        return v

    for k in range(n_sub):
        cur = slabs[k % 2]
        nxt = slabs[(k + 1) % 2]

        def read(qi, _cur=cur):
            fi = _cur[qi]
            if fi.dtype != compute_dtype:
                fi = fi.astype(compute_dtype)
            return fi

        rho, u, u2 = _moments(read, q, e, d, dev_storage)
        mxu = None
        if mxu_ref is not None:
            def read_all(_cur=cur):
                F = _cur[:]
                if F.dtype != compute_dtype:
                    F = F.astype(compute_dtype)
                return F
            mxu = {"ref": mxu_ref, "rows": mxu_rows,
                   "mode": mxu_dot_mode, "read_all": read_all}
        fpost_of = _make_collide(spec, e, w, opposite, cs, d, rho, u, u2,
                                 read, dev_storage, mxu=mxu)
        last = k == n_sub - 1
        m = k + 1
        for qi in range(q):
            fpost = fpost_of(qi)
            if ncm is not None:
                fpost = jnp.where(ncm == 0, fpost, read(qi))
            for kind, index in boundary_kinds:
                if kind == "bounce_back":
                    fpost = jnp.where(ncm == index,
                                      read(int(opposite[qi])), fpost)
                elif kind == "equilibrium_pu":
                    val = feq_boundary[index - 1][qi]
                    if dev_storage:
                        val = val - float(w[qi])
                    fpost = jnp.where(ncm == index,
                                      jnp.full_like(fpost, val), fpost)
                elif kind == "equilibrium_pu_field":
                    fpost = jnp.where(ncm == index, read_feq_field(qi),
                                      fpost)
            ez = int(e[qi, d - 1])
            shifted = _roll_minor(fpost, ez, S if is3d else R_s,
                                  roll_masks)
            ex = int(e[qi, 0])
            ey = int(e[qi, 1]) if is3d else 0

            def freeze(v, xs0, xs1, rs0=None, rs1=None, _qi=qi,
                       _fp=fpost):
                # frozen populations keep their post-collision value at
                # the destination (identical to the single-step kernel's
                # select, applied per sub-step in slab coordinates)
                if nsm_slab_ref is None:
                    return v
                if is3d:
                    nw = nsm_slab_ref[_qi, xs0:xs1, rs0:rs1]
                    fw = _fp[xs0:xs1, rs0:rs1]
                else:
                    nw = nsm_slab_ref[_qi, xs0:xs1]
                    fw = _fp[xs0:xs1]
                return jnp.where(nw, fw, v)

            if last:
                if is3d:
                    bys = out_ref.shape[2]
                    v = shifted[n_sub - ex:n_sub - ex + bx,
                                yhalo - ey * S:yhalo - ey * S + bys]
                    v = freeze(v, n_sub, n_sub + bx, yhalo, yhalo + bys)
                else:
                    v = shifted[n_sub - ex:n_sub - ex + bx]
                    v = freeze(v, n_sub, n_sub + bx)
                if minor_image is not None:
                    v = _minor_image_fix(v, minor_image[0], minor_image[1],
                                         S if is3d else v.shape[-2])
                if v.dtype != out_ref.dtype:
                    v = v.astype(out_ref.dtype)
                out_ref[qi] = v
            else:
                xs0, xs1 = m, X_s - m
                if is3d:
                    rs0, rs1 = m * S, R_s - m * S
                    v = shifted[xs0 - ex:xs1 - ex,
                                rs0 - ey * S:rs1 - ey * S]
                    v = freeze(v, xs0, xs1, rs0, rs1)
                    if v.dtype != nxt.dtype:
                        v = v.astype(nxt.dtype)
                    nxt[qi, xs0:xs1, rs0:rs1] = v
                else:
                    v = shifted[xs0 - ex:xs1 - ex]
                    v = freeze(v, xs0, xs1)
                    if v.dtype != nxt.dtype:
                        v = v.astype(nxt.dtype)
                    nxt[qi, xs0:xs1] = v


def _stream_collide_kernel(
        *refs,
        e: np.ndarray, w: np.ndarray, opposite: np.ndarray, cs: float,
        tau_inv: Optional[float], bx: int, by: Optional[int], S: int,
        has_ncm: bool, has_nsm: bool,
        boundary_kinds: Tuple[Tuple[str, int], ...],
        feq_boundary: Optional[tuple], yhalo: int = YHALO,
        collision_spec: Optional[tuple] = None,
        has_feq_field: bool = False,
        dev_storage: bool = False, debug_mode: str = "full",
        n_sub: int = 1, minor_image: Optional[Tuple[int, int]] = None,
        emit_u: bool = False, mxu_rows=None, mxu_dot_mode: str = "off"):
    """Kernel body (2D: by is None). With ``dev_storage`` the state is the
    deviation g = f - w_q (typically in bfloat16): since sum_q e_q w_q = 0,
    only rho gains +1 and the relaxed base term gains -tau_inv.

    With ``n_sub > 1`` (temporal blocking, periodic configurations only)
    the kernel advances ``n_sub`` collide-and-stream sub-steps per
    invocation: the x halo deepens to ``n_sub`` planes and the valid slab
    region shrinks by one plane and S merged rows per sub-step, while HBM
    traffic per step drops almost ``n_sub``-fold.
    """
    q = e.shape[0]
    cs2 = cs * cs
    is3d = by is not None
    n_parts = 9 if is3d else 3

    f_parts = refs[:n_parts]
    idx = n_parts
    ncm_parts = None
    if has_ncm:
        ncm_parts = refs[idx:idx + n_parts]
        idx += n_parts
    feq_parts = None
    if has_feq_field:
        feq_parts = refs[idx:idx + n_parts]
        idx += n_parts
    nsm_block = None
    nsm_parts = None
    if has_nsm:
        if n_sub > 1:
            nsm_parts = refs[idx:idx + n_parts]
            idx += n_parts
        else:
            nsm_block = refs[idx]
            idx += 1
    mxu_ref = None
    if mxu_rows is not None:
        mxu_ref = refs[idx]
        idx += 1
    out_ref = refs[idx]
    idx += 1
    u_ref = None
    if emit_u:
        u_ref = refs[idx]
        idx += 1
    slab = refs[idx]
    idx += 1
    slab2 = None
    if n_sub > 1:
        slab2 = refs[idx]
        idx += 1
    if has_ncm:
        ncm_slab_ref = refs[idx]
        idx += 1
    else:
        ncm_slab_ref = None
    feq_slab_ref = None
    if has_feq_field:
        feq_slab_ref = refs[idx]
        idx += 1
    nsm_slab_ref = refs[idx] if (has_nsm and n_sub > 1) else None

    # ------------------------------------------------------------------
    # assemble the slab scratch, then compute from it (populations read
    # per use — no q-length value list stays live)
    # ------------------------------------------------------------------
    d = 3 if is3d else 2
    _store_parts(f_parts, slab, is3d, bx, by * S if is3d else None,
                 yhalo=yhalo, xhalo=n_sub)
    if has_ncm:
        _store_parts(ncm_parts, ncm_slab_ref, is3d, bx,
                     by * S if is3d else None, yhalo=yhalo, xhalo=n_sub)
    if has_feq_field:
        _store_parts(feq_parts, feq_slab_ref, is3d, bx,
                     by * S if is3d else None, yhalo=yhalo, xhalo=n_sub)
    if nsm_parts is not None:
        _store_parts(nsm_parts, nsm_slab_ref, is3d, bx,
                     by * S if is3d else None, yhalo=yhalo, xhalo=n_sub)

    # 16-bit state (bfloat16 / true float16, reference torch.float16
    # parity ``_context.py:54``) stores half-width but computes in f32
    compute_dtype = (jnp.float32 if jnp.dtype(slab.dtype).itemsize == 2
                     else slab.dtype)

    spec = collision_spec
    if spec is None:
        spec = ("none",) if tau_inv is None else ("bgk", tau_inv)
    if debug_mode == "no_collide":
        spec = ("none",)

    if n_sub > 1:
        _multi_sweep(slab, slab2, out_ref, spec, e, w, opposite, cs, d,
                     bx, S, yhalo, n_sub, is3d, compute_dtype, dev_storage,
                     ncm_slab_ref=ncm_slab_ref, feq_slab_ref=feq_slab_ref,
                     boundary_kinds=tuple(boundary_kinds),
                     feq_boundary=feq_boundary, minor_image=minor_image,
                     nsm_slab_ref=nsm_slab_ref, mxu_ref=mxu_ref,
                     mxu_rows=mxu_rows, mxu_dot_mode=mxu_dot_mode)
        return

    def read_feq_field(qi):
        v = feq_slab_ref[qi]
        if v.dtype != compute_dtype:
            v = v.astype(compute_dtype)
        return v

    def read(qi):
        fi = slab[qi]
        if fi.dtype != compute_dtype:
            fi = fi.astype(compute_dtype)
        return fi

    rho, u, u2 = _moments(read, q, e, d, dev_storage)

    ncm = ncm_slab_ref[:] if has_ncm else None
    if is3d:
        bys = by * S
        interior = (slice(1, 1 + bx), slice(yhalo, yhalo + bys))
    else:
        bys = None
        interior = (slice(1, 1 + bx), slice(None))

    if u_ref is not None:
        # pre-collision velocity as a second output: the adjoint kernel's
        # residual (d fields instead of q — see ops/pallas/adjoint.py)
        for a in range(d):
            val = u[a][interior]
            if val.dtype != u_ref.dtype:
                val = val.astype(u_ref.dtype)
            u_ref[a] = val

    # ------------------------------------------------------------------
    # fused per-q pipeline: collide (pluggable fragment) -> boundary
    # replace -> pull-stream -> write
    # ------------------------------------------------------------------
    mxu = None
    if mxu_ref is not None:
        def read_all():
            F = slab[:]
            if F.dtype != compute_dtype:
                F = F.astype(compute_dtype)
            return F
        mxu = {"ref": mxu_ref, "rows": mxu_rows,
               "mode": mxu_dot_mode, "read_all": read_all}
    fpost_of = _make_collide(spec, e, w, opposite, cs, d, rho, u, u2,
                             read, dev_storage, mxu=mxu)

    slab_val_shape = ((bx + 2, yhalo + by * S + yhalo, LANES) if is3d
                      else (bx + 2, slab.shape[-2], LANES))
    roll_masks = _RollMasks(slab_val_shape, S if is3d else
                            slab_val_shape[-2])

    for qi in range(q):
        fi = read(qi)
        fpost = fpost_of(qi)
        if has_ncm:
            fpost = jnp.where(ncm == 0, fpost, fi)
        for kind, index in boundary_kinds:
            if kind == "bounce_back":
                fpost = jnp.where(ncm == index, read(int(opposite[qi])),
                                  fpost)
            elif kind == "equilibrium_pu":
                val = feq_boundary[index - 1][qi]
                if dev_storage:
                    val = val - float(w[qi])
                fpost = jnp.where(ncm == index, jnp.full_like(fpost, val),
                                  fpost)
            elif kind == "equilibrium_pu_field":
                fpost = jnp.where(ncm == index, read_feq_field(qi), fpost)

        # minor-axis shift first (only interior +- S rows are consumed)
        ez = int(e[qi, d - 1])
        if debug_mode == "no_zroll":
            shifted = fpost
        else:
            shifted = _roll_minor(fpost, ez, S if is3d else fpost.shape[-2],
                                  roll_masks)
        ex = int(e[qi, 0])
        if is3d:
            ey = int(e[qi, 1])
            shifted = shifted[1 - ex:1 - ex + bx,
                              yhalo - ey * S:yhalo - ey * S + bys]
        else:
            shifted = shifted[1 - ex:1 - ex + bx, :]
        if has_nsm:
            shifted = jnp.where(nsm_block[qi], fpost[interior], shifted)
        if minor_image is not None:
            shifted = _minor_image_fix(shifted, minor_image[0],
                                       minor_image[1],
                                       S if is3d else shifted.shape[-2])
        if shifted.dtype != out_ref.dtype:
            shifted = shifted.astype(out_ref.dtype)
        out_ref[qi] = shifted


def fused_stream_collide(f: jax.Array, e: np.ndarray, w: np.ndarray,
                         opposite: np.ndarray, cs: float,
                         tau_inv: Optional[float],
                         no_collision_mask: Optional[jax.Array] = None,
                         no_streaming_mask: Optional[jax.Array] = None,
                         boundary_kinds: Tuple[Tuple[str, int], ...] = (),
                         feq_boundary: Optional[tuple] = None,
                         block_target: Tuple[int, int] = (16, 32),
                         block_target_2d: int = 128,
                         vmem_limit_mb: Optional[int] = None,
                         collision_spec: Optional[tuple] = None,
                         feq_field: Optional[jax.Array] = None,
                         dev_storage: bool = False,
                         debug_mode: str = "full",
                         n_sub: int = 1,
                         yhalo_rows: Optional[int] = None,
                         minor_image: Optional[Tuple[int, int]] = None,
                         emit_u: bool = False,
                         wide_slab: Optional[bool] = None,
                         interpret: bool = False) -> jax.Array:
    """One fused collide-and-stream step via Pallas (``n_sub`` steps when
    temporally blocked).

    f: [q, X, Y] or [q, X, Y, Z]; the minor axis must be a multiple of 128
    and, in 3D, Z/128 must divide the halo depth (8 rows for f32, 16 for
    bfloat16). With ``dev_storage`` the array holds deviations g = f - w_q
    (usually bfloat16): HBM traffic halves while compute stays float32 and
    deviations keep full relative precision.

    ``n_sub > 1`` advances that many collide-and-stream steps in one
    kernel launch (temporal blocking): HBM traffic per step drops almost
    ``n_sub``-fold at the cost of a deeper x halo and a second VMEM slab.
    Mask-coded boundaries, per-node feq fields and frozen populations all
    compose (each is a pointwise select applied per sub-step); requires
    ``n_sub * S <= yhalo`` and ``bx % n_sub == 0``.
    """
    q = e.shape[0]
    shape = f.shape[1:]
    d = len(shape)
    bx, by, yhalo, S = plan_blocks(shape, q, f.dtype,
                                   block_target=block_target,
                                   block_target_2d=block_target_2d,
                                   yhalo_rows=yhalo_rows)

    if n_sub > 1:
        if bx % n_sub != 0:
            raise NotImplementedError(
                f"x block {bx} must be a multiple of n_sub={n_sub}")
        if d == 3 and n_sub * S > yhalo:
            raise NotImplementedError(
                f"n_sub={n_sub} needs {n_sub * S} halo rows, have {yhalo}")

    if d == 2:
        YS = S
        bys = None
        grid = (shape[0] // bx,)
        merged_shape = (q, shape[0], S, LANES)
        out_block = (q, bx, S, LANES)
        out_index = lambda i: (_I0, i, _I0, _I0)
    else:
        YS = shape[1] * S
        bys = by * S
        grid = (shape[0] // bx, shape[1] // by)
        merged_shape = (q, shape[0], YS, LANES)
        out_block = (q, bx, bys, LANES)
        out_index = lambda i, j: (_I0, i, j, _I0)

    f_packed = f.reshape(merged_shape)

    has_ncm = no_collision_mask is not None
    has_nsm = no_streaming_mask is not None
    has_feq_field = feq_field is not None

    f_specs = _halo_specs(shape[0], YS, bx, bys, lead_q=q, yhalo=yhalo,
                          xhalo=n_sub)
    in_specs = list(f_specs)
    inputs = [f_packed] * len(f_specs)
    if has_ncm:
        ncm_specs = _halo_specs(shape[0], YS, bx, bys, lead_q=None,
                                yhalo=yhalo, xhalo=n_sub)
        in_specs += list(ncm_specs)
        ncm_packed = no_collision_mask.astype(jnp.int32).reshape(
            merged_shape[1:])
        inputs += [ncm_packed] * len(ncm_specs)
    if has_feq_field:
        if dev_storage:
            w_b = jnp.asarray(w, jnp.float32).reshape(
                (-1,) + (1,) * d)
            feq_field = feq_field - w_b
        feq_packed = jnp.asarray(feq_field).astype(f.dtype).reshape(
            merged_shape)
        feq_specs = _halo_specs(shape[0], YS, bx, bys, lead_q=q,
                                yhalo=yhalo, xhalo=n_sub)
        in_specs += list(feq_specs)
        inputs += [feq_packed] * len(feq_specs)
    if has_nsm:
        nsm_packed = no_streaming_mask.reshape(merged_shape)
        if n_sub > 1:
            # intermediate sub-steps freeze destinations in the halo
            # region too: the mask needs the same halo'd slab as f
            nsm_specs = _halo_specs(shape[0], YS, bx, bys, lead_q=q,
                                    yhalo=yhalo, xhalo=n_sub)
            in_specs += list(nsm_specs)
            inputs += [nsm_packed] * len(nsm_specs)
        else:
            in_specs.append(pl.BlockSpec(out_block, out_index,
                                         memory_space=pltpu.VMEM))
            inputs.append(nsm_packed)

    if emit_u and n_sub > 1:
        raise NotImplementedError("emit_u is a single-step residual hook")

    # MXU moment formulation (LETTUCE_MXU=plane|slab): the static moment
    # matrices enter as a real kernel input (Pallas rejects closed-over
    # array constants — see benchmarks/micro_moments_mxu.py)
    mxu_rows = None
    mxu_dot = mxu_mode()
    if mxu_dot != "off" and collision_spec is not None:
        mm = build_mxu_matrix(collision_spec, e, w, opposite, cs, d)
        if mm is not None:
            mat_np, mxu_rows = mm
            in_specs.append(pl.BlockSpec(
                mat_np.shape, (lambda *_: (_I0,) * mat_np.ndim),
                memory_space=pltpu.VMEM))
            inputs.append(jnp.asarray(mat_np))

    kernel = partial(
        _stream_collide_kernel,
        e=e, w=w, opposite=opposite, cs=cs, tau_inv=tau_inv,
        bx=bx, by=by, S=S,
        has_ncm=has_ncm, has_nsm=has_nsm,
        boundary_kinds=tuple(boundary_kinds),
        feq_boundary=feq_boundary, yhalo=yhalo,
        collision_spec=collision_spec,
        has_feq_field=has_feq_field,
        dev_storage=dev_storage, debug_mode=debug_mode, n_sub=n_sub,
        minor_image=minor_image, emit_u=emit_u,
        mxu_rows=mxu_rows, mxu_dot_mode=mxu_dot)

    compiler_params = None
    if vmem_limit_mb is not None:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)

    slab_rows = YS if d == 2 else bys + 2 * yhalo
    slab_shape = (q, bx + 2 * n_sub, slab_rows, LANES)
    # 16-bit storage computes in f32; keeping the slab scratches f32 too
    # ("wide slabs") converts once on fill and once on the final write
    # instead of per-sub-step, keeps every slab op on native 8-row f32
    # tiles (bf16's 16-row tile makes the 8-row halo slices sub-tile
    # relayouts), and carries full precision BETWEEN sub-steps — HBM
    # rounding happens only at launch boundaries. Costs 2x slab VMEM.
    if wide_slab is None:
        wide_slab = jnp.dtype(f.dtype).itemsize == 2
    slab_dtype = jnp.float32 if wide_slab else f.dtype
    scratch = [pltpu.VMEM(slab_shape, slab_dtype)]
    if n_sub > 1:
        scratch.append(pltpu.VMEM(slab_shape, slab_dtype))  # ping-pong
    if has_ncm:
        scratch.append(pltpu.VMEM((bx + 2 * n_sub, slab_rows, LANES),
                                  jnp.int32))
    if has_feq_field:
        scratch.append(pltpu.VMEM((q, bx + 2 * n_sub, slab_rows, LANES),
                                  f.dtype))
    if has_nsm and n_sub > 1:
        scratch.append(pltpu.VMEM((q, bx + 2 * n_sub, slab_rows, LANES),
                                  jnp.bool_))

    out_specs = pl.BlockSpec(out_block, out_index, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(merged_shape, f.dtype)
    if emit_u:
        u_dtype = (jnp.float32 if jnp.dtype(f.dtype).itemsize == 2
                   else f.dtype)
        out_specs = [out_specs,
                     pl.BlockSpec((d,) + out_block[1:], out_index,
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((d,) + merged_shape[1:], u_dtype)]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=compiler_params,
        interpret=interpret,
    )(*inputs)
    if emit_u:
        out, u_out = out
        return out.reshape(f.shape), u_out.reshape((d,) + f.shape[1:])
    return out.reshape(f.shape)


def gate_fused_params(simulation: "Simulation",
                      allow_hybrid: bool = False) -> dict:
    """Capability gating + static kernel parameters for a Simulation.

    Raises NotImplementedError when any component cannot run inside the
    kernel (mirroring the reference's native_available probes,
    ``_simulation.py:100-115``). Returns the keyword arguments shared by
    the single-device and sharded fused steps (everything except the mask
    arrays, which the sharded path supplies per shard).

    With ``allow_hybrid`` (single-device build only), outlet boundaries
    are accepted and returned under ``"hybrid_boundaries"`` — the kernel
    treats their nodes as frozen (no boundary fragment -> identity
    f_post) and the caller patches the few affected planes with an exact
    jnp fix-up afterwards (see ``hybrid_outlets.build_hybrid_fixup``).
    """
    if (simulation.context.platform == "tpu"
            and simulation.flow.f.dtype == jnp.float64):
        # TPU hardware has no f64 units; XLA emulates x64 by a rewrite
        # pass that cannot see inside custom calls, so an f64 pallas_call
        # fails AOT compilation ("While rewriting computation to not
        # contain X64 element types..."). f64 is the correctness mode:
        # it runs the jnp path, where the emulation works.
        raise NotImplementedError(
            "float64 state runs the jnp path on TPU (XLA's x64 emulation "
            "does not extend into Pallas kernels)")
    from ..collision import (BGKCollision, NoCollision, TRTCollision,
                             RegularizedCollision, SmagorinskyCollision,
                             KBCCollision, MRTCollision)
    from ..equilibrium import QuadraticEquilibrium
    from ..boundary import (HYBRID_OUTLET_TYPES, BounceBackBoundary,
                            EquilibriumBoundaryPU)

    flow = simulation.flow
    stencil = flow.stencil
    d = stencil.d
    if d not in (2, 3):
        raise NotImplementedError("pallas kernel supports 2D/3D only")
    if not isinstance(flow.equilibrium, QuadraticEquilibrium):
        raise NotImplementedError

    collision = simulation.collision
    tau_inv = None

    def _tau_or_units(tau):
        return float(tau) if tau is not None \
            else float(flow.units.relaxation_parameter_lu)

    if isinstance(collision, BGKCollision):
        tau_inv = float(1.0 / collision.tau)
        if collision.force is not None:
            from ..force import Guo, ShanChen
            force = collision.force
            accel = np.asarray(force.acceleration)
            if accel.ndim != 1:
                raise NotImplementedError("per-node acceleration")
            if isinstance(force, Guo):
                k_ueq = float(force.ueq_scaling_factor)
                src_pref = float(1.0 - 1.0 / (2.0 * force.tau))
            elif isinstance(force, ShanChen):
                k_ueq = float(force.ueq_scaling_factor)
                src_pref = None
            else:
                raise NotImplementedError(type(force).__name__)
            collision_spec = ("bgk_force", tau_inv,
                              tuple(float(a) for a in accel), k_ueq,
                              src_pref)
        else:
            collision_spec = ("bgk", tau_inv)
    elif isinstance(collision, NoCollision):
        collision_spec = ("none",)
    elif isinstance(collision, TRTCollision):
        collision_spec = ("trt", float(collision.tau_plus),
                          float(collision.tau_minus))
    elif isinstance(collision, SmagorinskyCollision):
        if collision.force is not None:
            raise NotImplementedError
        collision_spec = ("smag", float(collision.tau),
                          float(collision.constant))
    elif isinstance(collision, RegularizedCollision):
        collision_spec = ("reg", _tau_or_units(collision.tau))
    elif isinstance(collision, MRTCollision):
        from ..utils_moments_shim import resolve_mrt_spec
        collision_spec = resolve_mrt_spec(collision)
    elif isinstance(collision, KBCCollision):
        from ..collision import KBCCollision as _KBC
        from ...stencil import D2Q9 as _D2Q9, D3Q27 as _D3Q27
        if not isinstance(stencil, (_D2Q9, _D3Q27)):
            raise NotImplementedError
        collision_spec = ("kbc", _tau_or_units(collision.tau))
    else:
        raise NotImplementedError

    from ..boundary import combined_equilibrium_field
    feq_field, pernode = combined_equilibrium_field(
        flow, simulation.boundaries, simulation.no_collision_mask)

    boundary_kinds: List[Tuple[str, int]] = []
    feq_b = []
    hybrid: List[Tuple[int, "Boundary"]] = []
    for index, boundary in enumerate(simulation.boundaries[1:], start=1):
        if allow_hybrid and type(boundary) in HYBRID_OUTLET_TYPES:
            # no kernel fragment: the kernel leaves these nodes frozen
            # (identity f_post); exact values patched in afterwards
            hybrid.append((index, boundary))
            feq_b.append(None)
        elif isinstance(boundary, BounceBackBoundary):
            boundary_kinds.append(("bounce_back", index))
            feq_b.append(None)
        elif isinstance(boundary, EquilibriumBoundaryPU):
            if index in pernode:
                # per-node values run via the combined feq field (the
                # reference's broadcast-aware native path,
                # cuda_native/ext/_boundary/equilibrium_pu.py)
                feq_b.append(None)
                boundary_kinds.append(("equilibrium_pu_field", index))
            else:
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

    params = dict(e=e, w=w, opposite=opposite, cs=cs, tau_inv=tau_inv,
                  collision_spec=collision_spec,
                  boundary_kinds=tuple(boundary_kinds),
                  feq_boundary=tuple(feq_b),
                  feq_field=feq_field,
                  # 100 MB measured faster than 64 on v5e at every n_sub
                  # (benchmarks/sweep_kernel.py)
                  vmem_limit_mb=100 if not interpret else None,
                  interpret=interpret)
    if d == 3 and (collision_spec[0] == "mrt"
                   or (collision_spec[0] == "reg" and stencil.q > 19)):
        # fragments that keep many slab-sized values live (2q moments for
        # MRT; Pi tensor + projections for regularized at q=27) overflow
        # VMEM at the default block — the compile helper dies; a
        # quarter-size block fits
        params["block_target"] = (8, 16)
    import os as _os
    bt_env = _os.environ.get("LETTUCE_BLOCK_TARGET")
    if bt_env:  # benchmark sweeps (see benchmarks/sweep_kernel.py)
        params["block_target"] = tuple(
            int(v) for v in bt_env.split(","))[:2]
    # padding plan: None for kernel-splittable grids; otherwise the plan
    # that makes the grid splittable via ghost-image padding (padding.py).
    # Raises NotImplementedError only for unsupported dimensionalities.
    from .padding import plan_padding
    pad_plan = plan_padding(tuple(flow.resolution), stencil.q, flow.f.dtype,
                            block_target=params.get("block_target",
                                                    (16, 32)))
    params["pad_plan"] = pad_plan
    if pad_plan is not None and pad_plan.yhalo_rows is not None:
        params["yhalo_rows"] = pad_plan.yhalo_rows
    if allow_hybrid:
        params["hybrid_boundaries"] = tuple(hybrid)
    return params


def _nsm_outside_regions(nsm, regions) -> bool:
    """True if any frozen population lies outside the planes the hybrid
    fix-up rewrites (regions = [(grid_axis, plane_indices), ...])."""
    outside = np.asarray(nsm).copy()
    for axis, rewritten in regions:
        sel = [slice(None)] * outside.ndim
        sel[axis + 1] = np.asarray(rewritten)
        outside[tuple(sel)] = False
    return bool(outside.any())


def build_fused_step(simulation: "Simulation", dev_storage: bool = False):
    """Single-device fused step with the simulation's masks baked in.

    With ``dev_storage`` the returned step operates on bfloat16 deviation
    state g = f - w_q (see fused_stream_collide).

    The returned step is reverse-mode differentiable: ``pallas_call`` has
    no autodiff rule, so a ``custom_vjp`` runs the kernel forward and pulls
    the cotangent back through the mathematically identical jnp step
    (matching the reference's differentiate-through-everything property,
    ``/root/reference/README.rst:27``). The residual is the step input —
    the same memory autodiff of the jnp path would save.
    """
    params = gate_fused_params(simulation, allow_hybrid=True)
    hybrid = params.pop("hybrid_boundaries", ())
    pad_plan = params.pop("pad_plan", None)
    if (dev_storage and params["collision_spec"][0] == "mrt"
            and params["collision_spec"][4] != "from_feq"):
        # analytic equilibrium moments are not shift-invariant in f; the
        # folded from_feq form works on f - feq and composes fine
        raise NotImplementedError("analytic-moment MRT fragment is not "
                                  "shift-invariant; half storage "
                                  "unsupported")
    if hybrid and dev_storage:
        raise NotImplementedError("hybrid outlet fix-up operates on f; "
                                  "half storage unsupported")
    if dev_storage:
        # bf16 deviation storage doubles the halo depth; re-plan padding
        # (and the block split) at that alignment
        from .padding import plan_padding
        pad_plan = plan_padding(tuple(simulation.flow.resolution),
                                simulation.flow.stencil.q, jnp.bfloat16,
                                block_target=params.get("block_target",
                                                        (16, 32)))
        params.pop("yhalo_rows", None)
        if pad_plan is not None and pad_plan.yhalo_rows is not None:
            params["yhalo_rows"] = pad_plan.yhalo_rows
    padding = pad_plan if (pad_plan is not None and pad_plan.axes) else None

    ncm = simulation.no_collision_mask
    nsm = simulation.no_streaming_mask
    if nsm is not None and not bool(np.any(np.asarray(nsm))):
        nsm = None

    fixup = None
    if hybrid:
        from .hybrid_outlets import build_hybrid_fixup
        fixup, regions = build_hybrid_fixup(simulation, hybrid,
                                            pad_plan=padding)
        if nsm is not None and not _nsm_outside_regions(nsm, regions):
            # the fix-up overwrites the frozen planes anyway — if every
            # frozen population lives there, spare the kernel the whole
            # no-streaming input and per-q select
            nsm = None

    if padding is not None:
        # masks / per-node feq become padded static fields (full image
        # semantics, so ghost-band nodes compute their sources' physics)
        if ncm is not None:
            ncm = jnp.asarray(padding.pad_static(ncm, lead=0))
        if nsm is not None:
            nsm = jnp.asarray(padding.pad_static(nsm, lead=1))
        if params.get("feq_field") is not None:
            params["feq_field"] = padding.pad_static(params["feq_field"],
                                                     lead=1)
        # image-mode minor bands are rewritten in VMEM by the kernel
        params["minor_image"] = padding.minor_image

    def fused(f):
        return fused_stream_collide(
            f, no_collision_mask=ncm, no_streaming_mask=nsm,
            dev_storage=dev_storage, **params)

    if fixup is not None:
        kernel_only = fused

        def fused(f):  # noqa: F811 — kernel pass + exact plane fix-up
            return fixup(f, kernel_only(f))

    if padding is not None and (fixup is not None
                                or padding.leading_axes_padded):
        inner = fused
        # full refresh after a fix-up (it rewrote the valid region only);
        # otherwise only the cheap tile-aligned leading-axis updates — the
        # kernel already wrote the minor image bands (or the minor tiling
        # is self-consistent)
        full = fixup is not None

        def fused(f):  # noqa: F811 — kernel (+fix-up) then image refresh
            return padding.refresh(inner(f), skip_minor=not full)

    if dev_storage:
        # deviation storage is a throughput mode; gradients go through the
        # full-precision path
        fused.pad_codec = padding.codec() if padding is not None else None
        return fused

    jnp_step = simulation._build_jnp_step()
    if padding is not None:
        # the padded twin of the jnp step: identical on the valid region,
        # periodic images on the ghost bands (what refresh produces)
        jnp_true = jnp_step

        def jnp_step(fp):  # noqa: F811
            return padding.pad_state(jnp_true(padding.unpad(fp)))

    # backward rule: the adjoint kernel (exact VJP in one memory-bound
    # pass, ~2/3 forward speed) when the configuration supports it,
    # otherwise the jnp-path vjp (exact but ~10x slower). LETTUCE_ADJOINT=0
    # forces the jnp vjp (A/B benchmarking). Ghost-image padding composes:
    # the step's transpose is zero_pad . fold . K_p^T . zero_pad . fold
    # (K_p the padded kernel map — boundary dependencies ride the INPUT
    # image bands created by pad_state, so the adjoint kernel's own wrap
    # reads only ever see zeroed ghost cotangents). The INPUT fold is
    # skipped: every supported consumer of padded state (the step chain
    # itself, whose backward zeroes the ghost bands, and the codec's
    # unpad, whose transpose zero-pads) hands this rule a cotangent with
    # ZERO ghost bands, making zero_pad . fold the identity. The OUTPUT
    # fold is mandatory (input-image cells carry real cotangents) and
    # runs in-kernel for the minor axis (_minor_fold) + as tile-aligned
    # slice adds for leading axes (fold_zero_leading).
    import os as _os
    adjoint = None
    if _os.environ.get("LETTUCE_ADJOINT", "1") != "0":
        try:
            from .adjoint import build_adjoint_step
            adjoint = build_adjoint_step(
                simulation, params, ncm, nsm,
                shape=padding.padded if padding is not None else None,
                minor_fold=(padding.minor_fold if padding is not None
                            else None),
                # the hybrid backward stores f anyway (the window-replay
                # vjp linearizes at it), so the emitted-u residual would
                # only add memory
                residual_u=False if hybrid else None)
        except NotImplementedError:
            adjoint = None

    @jax.custom_vjp
    def step(f):
        return fused(f)

    if adjoint is not None and hybrid:
        # outlet flows: the fix-up is pure jnp and LINEAR in the kernel
        # output (window .set / pass-through), so its own vjp splits the
        # cotangent exactly — the written planes' part linearizes the
        # window replay (tiny), the pass-through part (written planes
        # zeroed) feeds the adjoint kernel, which is the exact transpose
        # of the kernel-as-run because every locally-contaminated entry
        # (frozen outlet nodes' neighbourhood) lies inside the written
        # planes.
        def step_fwd(f):
            return fused(f), f

        def step_bwd(f, ct):
            _, vjp_fix = jax.vjp(fixup, f, jnp.zeros_like(ct))
            df_replay, dk = vjp_fix(ct)
            ad = adjoint(f, dk)
            if padding is not None and padding.leading_axes_padded:
                ad = padding.fold_zero_leading(ad)
            return (ad + df_replay,)
    elif adjoint is not None:
        if adjoint.residual == "u":
            # the forward-under-vjp variant also emits the pre-collision
            # velocity: the only jacobian input the adjoint needs, at d
            # residual fields instead of q (throughput calls outside vjp
            # run the plain primal and never pay the extra writes)
            def step_fwd(f):
                out, u = fused_stream_collide(
                    f, no_collision_mask=ncm, no_streaming_mask=nsm,
                    dev_storage=dev_storage, emit_u=True, **params)
                if padding is not None and padding.leading_axes_padded:
                    # keep the primal/fwd outputs identical (the kernel's
                    # in-VMEM fix covered the minor bands)
                    out = padding.refresh(out, skip_minor=True)
                return out, u
        elif adjoint.residual == "f":
            # state residual (Smagorinsky: the jacobian needs rho and
            # the deviations, not just u)
            def step_fwd(f):
                return fused(f), f
        else:
            def step_fwd(f):
                return fused(f), None

        if padding is not None:
            def step_bwd(res, ct):
                ad = adjoint(res, ct)
                if padding.leading_axes_padded:
                    ad = padding.fold_zero_leading(ad)
                return (ad,)
        else:
            def step_bwd(res, ct):
                return (adjoint(res, ct),)
    else:
        def step_fwd(f):
            return fused(f), f

        def step_bwd(f, ct):
            _, vjp = jax.vjp(jnp_step, f)
            return vjp(ct)

    step.defvjp(step_fwd, step_bwd)

    def stepped(f):
        return step(f)

    stepped.pad_codec = padding.codec() if padding is not None else None
    stepped.adjoint_kernel = adjoint is not None
    stepped.adjoint_mode = getattr(adjoint, "mode", None)
    return stepped


def build_fused_multi_step(simulation: "Simulation",
                           dev_storage: bool = False,
                           n_sub: Optional[int] = None):
    """Temporally-blocked fused step: returns ``(step_fn, span)`` where
    ``step_fn`` advances ``span`` collide-and-stream steps per kernel
    launch, or None when the configuration cannot use temporal blocking
    (boundaries / masks / per-node feq, or no valid halo depth).

    Traffic per step drops almost ``span``-fold — the lever that takes the
    kernel past the single-step memory bound. The ``LETTUCE_NSUB``
    environment variable overrides the span (0 disables).
    """
    import os as _os

    env = _os.environ.get("LETTUCE_NSUB")
    if simulation.context.platform != "tpu" and env is None:
        # interpret mode gains nothing and pays 'span' kernel traces
        return None
    try:
        params = gate_fused_params(simulation, allow_hybrid=True)
    except NotImplementedError:
        return None
    hybrid = params.pop("hybrid_boundaries", ())
    pad_plan = params.pop("pad_plan", None)
    params.pop("yhalo_rows", None)  # re-derived below from the plan
    if hybrid and dev_storage:
        return None  # the outlet fix-up operates on f, not deviations
    nsm = simulation.no_streaming_mask
    if nsm is not None and not bool(np.any(np.asarray(nsm))):
        nsm = None
    if (dev_storage and params["collision_spec"][0] == "mrt"
            and params["collision_spec"][4] != "from_feq"):
        return None

    q = simulation.flow.stencil.q
    dtype = jnp.bfloat16 if dev_storage else simulation.flow.f.dtype
    if dev_storage:
        from .padding import plan_padding
        try:
            pad_plan = plan_padding(tuple(simulation.flow.resolution), q,
                                    jnp.bfloat16,
                                    block_target=params.get("block_target",
                                                            (16, 32)))
        except NotImplementedError:
            return None
    padding = pad_plan if (pad_plan is not None and pad_plan.axes) else None
    shape = (pad_plan.padded if padding is not None
             else tuple(simulation.flow.resolution))
    if padding is not None:
        if params.get("feq_field") is not None:
            params["feq_field"] = padding.pad_static(params["feq_field"],
                                                     lead=1)
        params["minor_image"] = padding.minor_image

    if (dev_storage and len(shape) == 3 and padding is None
            and "block_target" not in params
            and _os.environ.get("LETTUCE_BLOCK_TARGET") is None):
        # bf16-dev is VPU-compute-bound (~0.07 ns per slab cell), so the
        # win is a taller y block cutting the halo-recompute share:
        # (16, 64) at n_sub=2 measured 10123 MLUPS vs 9636 at (16, 32)
        # (D3Q19 256^3, benchmarks/sweep_kernel.py). Needs the 128 MB
        # VMEM budget (f32 slabs ~103 MB); (32, 64) overflows it.
        params["block_target"] = (16, 64)
        params["vmem_limit_mb"] = 128

    if env is not None:
        candidates = [int(env)]
    elif n_sub is not None:
        candidates = [int(n_sub)]
    elif dev_storage:
        # wide (f32) slabs keep every slab op on native 8-row f32 tiles
        # (narrow bf16 slabs relayout per sub-step: 8465 vs 9636 MLUPS)
        # but the 3D kernel stays compute-bound, so deeper blocking
        # loses: n_sub=2 measured 10123 vs 8827 at n_sub=4 (big blocks,
        # this chip) — the halo recompute eats the traffic saving. In 2D
        # the halo amp is tiny ((bx+2n)/bx with bx up to 128), so one
        # more doubling pays: n_sub=4 15638 vs 14177 at n_sub=2
        # (D2Q9 2048^2 sweep)
        candidates = [2] if len(shape) == 3 else [4, 2]
    elif params["collision_spec"][0] in ("kbc", "mrt") or (
            params["collision_spec"][0] == "reg" and q > 19):
        # compute-bound fragments: blocking's halo recompute
        # ((bx + 2 ns)/bx extra work per site) eats the traffic saving
        # past n_sub=2 (KBC D3Q27 256^3: 2669 MLUPS at x2 vs 2101 at x4
        # and 2088 single-step)
        candidates = [2]
    else:
        # memory-bound fragments (f32): peak at n_sub=4 (8644 MLUPS vs
        # 5693 at n_sub=2 for BGK D3Q19 256^3). 2D n_sub=8 looked +27%
        # in the short-run sweep but that was dispatch-overhead bias:
        # end-to-end it gains only ~2% on pure TGV and LOSES 5-15% on
        # masked/forced configs (couette 18848 vs 20835, cavity 17645
        # vs 20700, poiseuille 17808 vs 19666) — stay at 4
        candidates = [4, 2]
    if padding is not None:
        # ghost images stay valid for max_n_sub in-slab sub-steps
        candidates = [ns for ns in candidates if ns <= padding.max_n_sub]

    # bf16's tile-derived 16-row halo costs ~8% throughput; the 8-row halo
    # is sub-tile for bf16 but measured faster (8500 vs 7867 MLUPS) and
    # bitwise-verified — use it whenever the depth constraints allow
    yhalo_rows = pad_plan.yhalo_rows if pad_plan is not None else None
    if dev_storage and yhalo_rows is None:
        S_minor = shape[-1] // LANES
        if YHALO % max(1, S_minor) == 0 and all(
                ns * S_minor <= YHALO for ns in candidates if ns > 1):
            yhalo_rows = YHALO
    try:
        bx, by, yhalo, S = plan_blocks(
            shape, q, dtype, yhalo_rows=yhalo_rows,
            block_target=params.get("block_target", (16, 32)))
    except NotImplementedError:
        return None
    for ns in candidates:
        if ns <= 1:
            continue
        if bx % ns != 0:
            continue
        if len(shape) == 3 and ns * S > yhalo:
            continue

        ncm = simulation.no_collision_mask
        if padding is not None and ncm is not None:
            ncm = jnp.asarray(padding.pad_static(ncm, lead=0))

        fixup = None
        nsm_k = nsm
        if hybrid:
            # replay ns steps on the outlet window; the blocked kernel's
            # contamination cone (outlet planes +- ns) is exactly what
            # the fix-up rewrites
            from .hybrid_outlets import build_hybrid_fixup
            try:
                fixup, regions = build_hybrid_fixup(
                    simulation, hybrid, n_sub=ns, pad_plan=padding)
            except NotImplementedError:
                continue
            if nsm_k is not None and not _nsm_outside_regions(nsm_k,
                                                              regions):
                # every frozen population lives on fix-up-rewritten
                # planes: spare the kernel the whole mask slab
                nsm_k = None
        if nsm_k is not None and padding is not None:
            nsm_k = jnp.asarray(padding.pad_static(nsm_k, lead=1))

        def step(f, _ns=ns, _fix=fixup, _nsm=nsm_k):
            out = fused_stream_collide(
                f, no_collision_mask=ncm, no_streaming_mask=_nsm,
                dev_storage=dev_storage,
                n_sub=_ns, yhalo_rows=yhalo_rows, **params)
            if _fix is not None:
                out = _fix(f, out)
            if padding is not None:
                if _fix is not None:
                    out = padding.refresh(out)
                elif padding.leading_axes_padded:
                    out = padding.refresh(out, skip_minor=True)
            return out

        step.adjoint_kernel = False
        # blocked adjoint (periodic, f-linear collisions, full precision):
        # custom_vjp whose backward is ONE recompute-in-block Pallas pass
        # for all ns sub-steps (ops/pallas/adjoint.py, fused_adjoint_multi)
        # — gradient rollouts then run at blocked-kernel speed instead of
        # scanning the single-step adjoint
        if (not dev_storage and fixup is None and padding is None
                and ncm is None and nsm_k is None
                and _os.environ.get("LETTUCE_ADJOINT", "1") != "0"):
            try:
                from .adjoint import (adjoint_collision_spec,
                                      fused_adjoint_multi,
                                      plan_adjoint_multi)
                adj_spec = adjoint_collision_spec(params)
                if adj_spec[0] == "smag":
                    raise NotImplementedError(
                        "blocked adjoint needs per-sub-step state for the "
                        "smagorinsky relaxation derivative")
                bt = params.get("block_target", (16, 32))
                if len(shape) == 3:
                    # the adjoint launch carries two slabs, the n_sub*d
                    # velocity-residual slab AND double-buffered windows
                    # for both f and the cotangent — the forward's (16,32)
                    # block overflows VMEM on v5e (n=2 needs 148 of
                    # 128 MB, n=4 133 MB even at (8,16)); measured fits:
                    bt = (8, 8) if ns >= 4 else (16, 16)
                plan_adjoint_multi(
                    tuple(simulation.flow.resolution), q,
                    simulation.flow.f.dtype, ns, block_target=bt)
                inner = step

                @jax.custom_vjp
                def step(f):  # noqa: F811
                    return inner(f)

                def step_fwd(f):
                    return inner(f), f

                def step_bwd(f, ct, _ns=ns, _bt=bt):
                    return (fused_adjoint_multi(
                        f, ct, params["e"], params["w"],
                        params["opposite"], params["cs"],
                        params["collision_spec"], adj_spec, _ns,
                        block_target=_bt,
                        vmem_limit_mb=params.get("vmem_limit_mb"),
                        interpret=params["interpret"]),)

                step.defvjp(step_fwd, step_bwd)
                stepped = step
                step = lambda f: stepped(f)
                step.adjoint_kernel = True
            except NotImplementedError:
                pass

        step.pad_codec = padding.codec() if padding is not None else None
        return step, ns
    return None
