"""Ghost-image padding: run the fused kernel on ANY grid resolution.

The fused stream-collide kernel (``stream_collide.py``) requires the minor
grid axis to be a multiple of 128 lanes, a y extent with a halo-aligned
divisor, and an x extent with a reasonable block divisor. The reference's
CUDA kernel had the same class of constraint (dims %16 / %8,
``/root/reference/lettuce/cuda_native/_template.py:34-37``); grids that
miss it used to fall 15-30x off the fused path here.

This module removes the cliff without touching the kernel: the state is
*padded* per axis and the pad region holds **periodic ghost images** of the
wrap-around planes, so the kernel's modular halo wrap and lane rolls read
exactly the values a true periodic roll at the unpadded extent would have
read. Two modes per axis:

* **tile mode** (padded extent is a whole multiple of the true extent):
  the pad holds full periodic copies. Tiling with period n is invariant
  under the (translation-equivariant) padded dynamics, so every ghost
  position stays an exact image of its true source for any number of
  steps — the padded run IS the true run, replicated.
* **image mode**: the first/last ``depth`` ghost positions hold images of
  the wrap sources; the middle is garbage that no valid read ever
  consumes (pull distance per sub-step is 1, and reads stop at the image
  band — the standard halo contamination-cone argument). Images are
  refreshed by two static slice-copies per axis after each kernel launch.
  Temporal blocking is capped at ``depth`` sub-steps per launch.

The padding lives at the *segment* level: ``Simulation`` pads once per
compiled segment (codec), the per-launch cost is only the tiny refresh.
Results on the valid region are bit-identical to the unpadded kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .stream_collide import LANES, YHALO, _pick_block, plan_blocks

__all__ = ["PadPlan", "plan_padding"]


class PadPlan:
    """Padding of a grid shape to a kernel-splittable shape.

    ``axes`` lists ``(axis, n, npad, tile, depth)`` for every padded grid
    axis: true extent ``n``, padded extent ``npad``, whether the pad is a
    full periodic tiling, and the usable ghost-image depth (number of
    sub-steps per launch the images stay valid for).
    """

    def __init__(self, shape: Tuple[int, ...], padded: Tuple[int, ...],
                 yhalo_rows: Optional[int] = None):
        self.shape = tuple(int(n) for n in shape)
        self.padded = tuple(int(n) for n in padded)
        self.yhalo_rows = yhalo_rows
        axes = []
        for a, (n, m) in enumerate(zip(self.shape, self.padded)):
            if m == n:
                continue
            tile = (m % n == 0)
            depth = (m - n) if tile else min(n, (m - n) // 2)
            axes.append((a, n, m, tile, depth))
        self.axes = tuple(axes)
        img = [d for (_, _, _, tile, d) in self.axes if not tile]
        # tiled axes stay exact for any number of sub-steps
        self.max_n_sub = min(img) if img else 1 << 30

    # ------------------------------------------------------------------
    def _image_index(self, n: int, m: int, tile: bool, depth: int
                     ) -> np.ndarray:
        """Source index per padded position: identity on the valid region,
        periodic images on the ghost bands (full tiling in tile mode),
        position 0 for the never-read middle."""
        idx = np.arange(m)
        if tile:
            return idx % n
        idx[n:] = 0
        idx[n:n + depth] = np.arange(depth)
        idx[m - depth:] = np.arange(n - depth, n)
        return idx

    def pad_static(self, arr, lead: int = 0) -> np.ndarray:
        """Pad a host-side static field (masks, feq_field) with full image
        semantics; ``lead`` counts leading non-grid axes (q)."""
        out = np.asarray(arr)
        for (a, n, m, tile, depth) in self.axes:
            out = np.take(out, self._image_index(n, m, tile, depth),
                          axis=lead + a)
        return out

    def pad_state(self, f: jax.Array, lead: int = 1) -> jax.Array:
        """Pad a device array, filling ghost bands with periodic images
        (differentiable: gather, whose vjp scatter-adds image cotangents
        back onto their sources)."""
        for (a, n, m, tile, depth) in self.axes:
            # int32 indices: under jax x64 (f64 state) np.arange would
            # trace as i64, which TPU gathers reject deep in lowering
            idx = jnp.asarray(self._image_index(n, m, tile, depth),
                              dtype=jnp.int32)
            f = jnp.take(f, idx, axis=lead + a)
        return f

    def unpad(self, fp: jax.Array, lead: int = 1) -> jax.Array:
        sel = [slice(None)] * fp.ndim
        for (a, n, _, _, _) in self.axes:
            sel[lead + a] = slice(0, n)
        return fp[tuple(sel)]

    def fold(self, ct: jax.Array, lead: int = 1) -> jax.Array:
        """Exact transpose of :meth:`pad_state`: accumulate every ghost
        position's cotangent onto its source and return the valid-shaped
        array, in reverse axis order so corner regions fold exactly like
        the sequential takes padded them. This is the REFERENCE transpose
        (lane-misaligned on the minor axis — a relayout pass); the
        production backward folds the minor axis in-kernel
        (``stream_collide._minor_fold``) and the leading axes via
        :meth:`fold_zero_leading`, and tests assert the two agree."""
        for (a, n, m, tile, depth) in reversed(self.axes):
            ct = self._fold_axis(ct, lead + a, n, m, tile, depth)
        return ct

    def zero_pad(self, arr: jax.Array, lead: int = 1) -> jax.Array:
        """Transpose of :meth:`unpad`: extend a valid-shaped array to the
        padded shape with ZERO ghost bands (padding is always trailing)."""
        pads = [(0, 0)] * arr.ndim
        for (a, n, m, _, _) in self.axes:
            pads[lead + a] = (0, m - n)
        return jnp.pad(arr, pads)

    @property
    def minor_image(self):
        """``(n_true, depth)`` when the minor axis is image-mode padded —
        the fused kernel then rewrites the image bands in VMEM
        (``stream_collide._minor_image_fix``) instead of the jnp refresh,
        whose lane-misaligned update-slice costs a full relayout pass.
        Tile-mode minors are self-consistent and need neither."""
        d = len(self.shape)
        for (a, n, _, tile, depth) in self.axes:
            if a == d - 1 and not tile:
                return (n, depth)
        return None

    @property
    def minor_fold(self):
        """``(n_true, depth)`` when the minor axis is padded (either
        mode) — the adjoint kernel then folds the minor ghost-band
        cotangents onto their wrap sources in VMEM
        (``stream_collide._minor_fold``); tile mode is detected there
        from ``npad % n == 0``."""
        d = len(self.shape)
        for (a, n, _, _, depth) in self.axes:
            if a == d - 1:
                return (n, depth)
        return None

    @property
    def leading_axes_padded(self) -> bool:
        d = len(self.shape)
        return any(a != d - 1 for (a, *_r) in self.axes)

    def fold_zero_leading(self, ct: jax.Array, lead: int = 1) -> jax.Array:
        """Fold the LEADING padded axes' ghost cotangents onto their
        sources and zero those bands, keeping the padded shape — the
        adjoint-kernel counterpart of :meth:`refresh` with
        ``skip_minor`` (the minor axis folds in-kernel). Leading-axis
        slices are tile-aligned, so this costs O(band), not a relayout
        pass."""
        d = len(self.shape)
        for (a, n, m, tile, depth) in reversed(self.axes):
            if a == d - 1:
                continue
            axis = lead + a
            body = self._fold_axis(ct, axis, n, m, tile, depth)
            zshape = list(ct.shape)
            zshape[axis] = m - n
            ct = jnp.concatenate(
                [body, jnp.zeros(zshape, dtype=ct.dtype)], axis=axis)
        return ct

    @staticmethod
    def _fold_axis(ct, axis: int, n: int, m: int, tile: bool, depth: int):
        """One axis of the :meth:`pad_state` transpose: the valid-shaped
        slice with every ghost position's cotangent accumulated onto its
        source (full copies summed in tile mode; image bands onto the
        wrap planes; the never-read middle onto position 0, matching the
        gather's scatter-add transpose)."""
        if tile:
            acc = jax.lax.slice_in_dim(ct, 0, n, axis=axis)
            for j in range(1, m // n):
                acc = acc + jax.lax.slice_in_dim(ct, j * n, (j + 1) * n,
                                                 axis=axis)
            return acc
        body = jax.lax.slice_in_dim(ct, 0, n, axis=axis)
        lo = jax.lax.slice_in_dim(ct, n, n + depth, axis=axis)
        hi = jax.lax.slice_in_dim(ct, m - depth, m, axis=axis)
        sel = [slice(None)] * ct.ndim
        sel[axis] = slice(0, depth)
        body = body.at[tuple(sel)].add(lo)
        sel[axis] = slice(n - depth, n)
        body = body.at[tuple(sel)].add(hi)
        if m - depth > n + depth:
            mid = jax.lax.slice_in_dim(ct, n + depth, m - depth, axis=axis)
            sel[axis] = slice(0, 1)
            body = body.at[tuple(sel)].add(mid.sum(axis=axis, keepdims=True))
        return body

    def refresh(self, fp: jax.Array, lead: int = 1,
                skip_minor: bool = False) -> jax.Array:
        """Rewrite the ghost bands from the valid region (post-launch).
        Tile axes are fully re-tiled — necessary when a fix-up wrote the
        valid region only; harmless (and cheap) otherwise. With
        ``skip_minor`` the minor axis is left to the kernel's in-VMEM
        image fix (leading-axis slice updates are tile-aligned and
        cheap; minor-lane updates are not)."""
        d = len(self.shape)
        for (a, n, m, tile, depth) in self.axes:
            if skip_minor and a == d - 1:
                continue
            axis = lead + a
            if tile:
                body = jax.lax.slice_in_dim(fp, 0, n, axis=axis)
                for j in range(1, m // n):
                    fp = jax.lax.dynamic_update_slice_in_dim(
                        fp, body, j * n, axis)
                continue
            lo = jax.lax.slice_in_dim(fp, 0, depth, axis=axis)
            fp = jax.lax.dynamic_update_slice_in_dim(fp, lo, n, axis)
            hi = jax.lax.slice_in_dim(fp, n - depth, n, axis=axis)
            fp = jax.lax.dynamic_update_slice_in_dim(fp, hi, m - depth, axis)
        return fp

    def codec(self, lead: int = 1):
        """(encode, decode) between public and padded state. Both carry
        custom VJPs: the pad gather's default transpose is a scatter-add
        (measured 3.3x slower per public step at 256^2x250), while
        :meth:`fold` / :meth:`zero_pad` are static slice adds."""
        @jax.custom_vjp
        def enc(f):
            return self.pad_state(f, lead)

        enc.defvjp(lambda f: (self.pad_state(f, lead), None),
                   lambda _res, ct: (self.fold(ct, lead),))

        @jax.custom_vjp
        def dec(fp):
            return self.unpad(fp, lead)

        dec.defvjp(lambda fp: (self.unpad(fp, lead), None),
                   lambda _res, ct: (self.zero_pad(ct, lead),))
        return enc, dec

    def transverse_true_slices(self, face_axis: int, lead: int = 1):
        """Selector restricting every padded grid axis except ``face_axis``
        to its true extent (hybrid fix-up windows)."""
        sel = {}
        for (a, n, _, _, _) in self.axes:
            if a != face_axis:
                sel[lead + a] = slice(0, n)
        return sel

    def __repr__(self):
        return (f"PadPlan({self.shape} -> {self.padded}, "
                f"axes={self.axes}, yhalo_rows={self.yhalo_rows})")


def _next_multiple(n: int, unit: int, at_least: int) -> int:
    m = max(n, at_least)
    return ((m + unit - 1) // unit) * unit


def _x_block_target(X: int, q: int, d: int, S: int, itemsize: int,
                    block_target: Tuple[int, int],
                    block_target_2d: int) -> int:
    """The x-block target plan_blocks would use (kept in sync with
    ``plan_blocks``)."""
    if d == 2:
        cap = max(8, (4 * 1024 * 1024) // (q * S * LANES * itemsize))
        return min(block_target_2d, cap)
    t = block_target[0]
    if q > 19:
        t = max(4, t * 19 // q)
    return t


def plan_padding(shape, q: int, dtype,
                 block_target: Tuple[int, int] = (16, 32),
                 block_target_2d: int = 128) -> Optional["PadPlan"]:
    """Padding plan making ``shape`` kernel-splittable, or None when the
    grid already is. Raises ``NotImplementedError`` only for dimensions the
    kernel cannot do at all (d not in 2/3)."""
    shape = tuple(int(n) for n in shape)
    d = len(shape)
    if d not in (2, 3):
        raise NotImplementedError("pallas kernel supports 2D/3D only")
    try:
        plan_blocks(shape, q, dtype, block_target=block_target,
                    block_target_2d=block_target_2d)
        splittable = True
    except NotImplementedError:
        splittable = False

    itemsize = jnp.dtype(dtype).itemsize
    padded = list(shape)

    # ---- minor axis -> multiple of 128 lanes, image depth >= 2 ----
    minor = shape[-1]
    if minor % LANES:
        npad = ((minor + LANES - 1) // LANES) * LANES
        if npad % minor and (npad - minor) < 4:
            npad += LANES  # image mode needs pad >= 2*depth, depth >= 2
        padded[-1] = npad
    S = padded[-1] // LANES

    # ---- halo depth: the kernel needs S | yhalo, and the halo block's
    # row count must be a multiple of 8 rows — Pallas rejects block
    # shapes whose second-minor dim is not (observed on real TPU, any
    # dtype; interpret mode does not check) ----
    base = 16 if jnp.dtype(dtype).itemsize == 2 else YHALO
    align = (S * 8) // np.gcd(S, 8)  # lcm(S, 8)
    yhalo_rows = None
    if base % align:
        yhalo_rows = ((base + align - 1) // align) * align
    yh = yhalo_rows if yhalo_rows is not None else base

    # ---- y axis (3D): needs a divisor that is a multiple of yhalo/S ----
    if d == 3:
        mult = max(1, yh // S)
        by = _pick_block(shape[1], block_target[1], multiple=mult)
        if by is None:
            unit = mult * max(1, -(-8 // mult))  # mult-multiple >= 8
            if unit > block_target[1]:
                unit = mult
            padded[1] = _next_multiple(shape[1] + 2, unit, shape[1] + 2)

    # ---- x axis: pad when only degenerate block splits exist, and only
    # onto an extent whose split is STRICTLY better. The score prefers
    # temporal-blocking-compatible splits (bx % 4, then bx % 2) over raw
    # block size: e.g. 256 at target 5 splits as bx=4 (blockable) while
    # the padded 260 would land on the odd divisor 5, which forbids
    # n_sub > 1 and runs ~3x slower — measured on regularized D3Q27 ----
    tx = _x_block_target(shape[0], q, d, S, itemsize, block_target,
                         block_target_2d)

    def _score(n):
        b = _pick_block(n, tx)
        if b is None:
            return (-1, -1)
        return (int(b % 4 == 0), int(b % 2 == 0))

    bx = _pick_block(shape[0], tx)
    if bx is not None and bx < min(8, tx):
        unit = 8 if tx >= 8 else 4
        cur = _score(shape[0])
        px = _next_multiple(shape[0] + 2, unit, shape[0] + 2)
        for _ in range(3):
            if _score(px) > cur:  # smallest strictly better pad wins
                padded[0] = px
                break
            px += unit

    padded = tuple(padded)
    if padded == shape:
        if splittable and yhalo_rows is None:
            return None  # the grid is fine as-is
        # splittable without padding once yhalo_rows is adjusted
        plan_blocks(shape, q, dtype, block_target=block_target,
                    block_target_2d=block_target_2d, yhalo_rows=yhalo_rows)
        return PadPlan(shape, shape, yhalo_rows=yhalo_rows)
    # validate: the padded shape must split (programming error otherwise)
    plan_blocks(padded, q, dtype, block_target=block_target,
                block_target_2d=block_target_2d, yhalo_rows=yhalo_rows)
    return PadPlan(shape, padded, yhalo_rows=yhalo_rows)
