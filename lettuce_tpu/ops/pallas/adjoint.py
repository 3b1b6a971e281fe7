"""Adjoint (reverse-mode) fused kernel: the backward pass at kernel speed.

``build_fused_step`` wraps the forward Pallas kernel in a ``custom_vjp``;
without this module the backward rule replays the jnp step under
``jax.vjp`` — mathematically exact but ~10x slower than the forward kernel
(the jnp path materialises intermediates between the per-q rolls and the
collision jacobian). Training a learned collision or an adjoint-based
inverse design (examples 06/09) then spends almost all its time in the
backward pass.

This kernel computes the exact vector-Jacobian product of one fused
collide-and-stream step in ONE memory-bound pass. The key observation is
that the adjoint of an LBM step is itself an LBM-shaped operation, mirror
imaged:

* forward:  pull-stream(+e) after a per-node collision;
* adjoint:  pull-stream(-e) of the cotangent FIRST (``h_i(y) =
  g_i(y + e_i)``), then the transposed collision jacobian. Writing the
  collision as ``f' = f - M (f - feq(f))`` with a static relaxation
  matrix M (BGK: ``M = I/tau``; TRT: ``M = (cp + cm) I + (cp - cm) O``,
  O the opposite permutation — both symmetric; folded MRT:
  ``M = Minv diag(1/tau) M``; regularized: ``M = I - (1 - 1/tau) P``),
  the transpose reduces to ``t = M^T h`` plus weighted moments of t:

      (J^T h)_j = h_j - t_j + (A' + e_j . B)

  with A' and B built from the moments S0 = sum w_i t_i,
  S1_a = sum w_i e_ia t_i, S2_ab = sum w_i e_ia e_ib t_i and the
  pre-collision velocity u — the same add/sub-tree shape as the forward
  equilibrium. (Derivation: feq_i = rho * phi_i(u),
  dfeq_i/df_j = phi_i + sum_a dphi_i/du_a (e_ja - u_a); contracting with
  t gives A = sum phi_i t_i, B_a = sum (dphi_i/du_a) t_i,
  A' = A - u . B. Sanity identities: h = 1 -> J^T h = 1 (mass
  conservation transposed), h_i = e_ib -> (J^T h)_j = e_jb.)

Boundary nodes transpose trivially: bounce-back (``f'_j = f_opp(j)``) has
adjoint ``ct_j = h_opp(j)``; equilibrium in/outflow replacements are
constant in f, so their adjoint is zero; frozen populations
(``no_streaming_mask``) re-route the cotangent as a static pre-shifted
mask pair. Everything the forward kernel's mask pipeline supports
(reference ``_simulation.py:177-189``) is covered; the hybrid outlet
fix-up and ghost-image padding compose around this kernel (see
``build_fused_step``). Collisions whose jacobian has no closed-form
fragment here (KBC, analytic-moment MRT, forcing) run the SPLIT mode:
streaming transpose in-kernel + a pointwise ``jax.vjp`` of the
pre-streaming map (``build_prestream``).

Memory traffic is 3q fields (read g with halos, read f, write ct) vs the
forward's 2q — the backward runs at ~2/3 forward kernel speed instead of
~1/15th of it. The reference has no analog: its autograd replays torch
ops (``README.rst:27`` advertises differentiability; all grads run at
eager-torch speed).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stream_collide import (LANES, YHALO, _I0, _halo_specs, _minor_fold,
                             _moments, _roll_minor, _store_parts,
                             _RollMasks, build_pair_apply, plan_blocks)

__all__ = ["fused_adjoint", "build_adjoint_step", "adjoint_collision_spec"]


def adjoint_collision_spec(params):
    """The transposed static relaxation spec for :func:`fused_adjoint`,
    derived from the forward gate's ``collision_spec`` — or raise
    ``NotImplementedError`` for collisions without an adjoint fragment
    (Smagorinsky/KBC: tau depends on f; analytic-moment MRT: a different
    equilibrium jacobian)."""
    spec = params["collision_spec"]
    if spec[0] == "mrt":
        # folded MRT f' = f - C (f - feq), C = Minv diag(1/tau) M static:
        # the transposed jacobian is t = C^T h plus the shared quadratic
        # equilibrium-jacobian moments. Analytic-meq forms relax toward
        # meq(rho, j) instead of the feq image — a different K — and fall
        # back to the jnp vjp for now.
        _, M_t, Minv_t, taus, meq_kind = spec
        if meq_kind != "from_feq":
            raise NotImplementedError(
                "adjoint kernel covers the folded from_feq MRT form only")
        M_np = np.asarray(M_t, dtype=np.float64)
        Minv_np = np.asarray(Minv_t, dtype=np.float64)
        s_np = 1.0 / np.asarray([float(t) for t in taus], dtype=np.float64)
        C = Minv_np @ (s_np[:, None] * M_np)
        return ("matvec", tuple(map(tuple, C.T)))
    if spec[0] == "reg":
        # regularized f' = feq + (1 - 1/tau) P (f - feq) with the static
        # projection P_ij = w_i ((e_i.e_j)^2 - cs^2 |e_j|^2) / (2 cs^4):
        # f-linear with C = I - (1 - 1/tau) P
        e_np = np.asarray(params["e"], dtype=np.float64)
        w_np = np.asarray(params["w"], dtype=np.float64)
        cs2 = float(params["cs"]) ** 2
        G = e_np @ e_np.T
        P = (G * G - cs2 * (e_np * e_np).sum(axis=1)[None, :]) \
            * (w_np[:, None] / (2.0 * cs2 * cs2))
        C = np.eye(len(w_np)) - (1.0 - 1.0 / float(spec[1])) * P
        return ("matvec", tuple(map(tuple, C.T)))
    if spec[0] not in ("bgk", "trt", "smag", "none"):
        raise NotImplementedError(
            f"adjoint kernel has no {spec[0]} jacobian fragment")
    return spec


def _pairs_of(e: np.ndarray, opposite: np.ndarray):
    """[(qp, qm)] unordered opposite pairs + the rest direction (e == 0)."""
    q = e.shape[0]
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
        else:
            pairs.append((qi, qo))
    return pairs, rest


def _adjoint_kernel(*refs, e: np.ndarray, w: np.ndarray,
                    opposite: np.ndarray, cs: float,
                    spec: tuple, bx: int, by: Optional[int],
                    S: int, has_ncm: bool, has_nsm: bool,
                    boundary_kinds: Tuple[Tuple[str, int], ...],
                    yhalo: int, residual_u: bool = False,
                    minor_fold: Optional[Tuple[int, int]] = None):
    q = e.shape[0]
    cs2 = cs * cs
    is3d = by is not None
    d = 3 if is3d else 2
    n_parts = 9 if is3d else 3
    kind = spec[0]

    g_parts = refs[:n_parts]
    idx = n_parts
    f_ref = None
    if kind != "none":  # NoCollision's adjoint needs no state
        f_ref = refs[idx]
        idx += 1
    ncm = None
    if has_ncm:
        ncm = refs[idx][:]
        idx += 1
    nsm_c_ref = nsm_s_ref = None
    if has_nsm:
        nsm_c_ref = refs[idx]      # nsm_i(y): pull from self
        nsm_s_ref = refs[idx + 1]  # nsm_i(y + e_i): destination frozen
        idx += 2
    out_ref = refs[idx]
    idx += 1
    gslab = refs[idx]

    _store_parts(g_parts, gslab, is3d, bx, by * S if is3d else None,
                 yhalo=yhalo)

    compute_dtype = (jnp.float32 if jnp.dtype(gslab.dtype).itemsize == 2
                     else gslab.dtype)

    def read_f(qi):
        fi = f_ref[qi]
        if fi.dtype != compute_dtype:
            fi = fi.astype(compute_dtype)
        return fi

    # pre-collision velocity at the centre block (the only jacobian
    # input): either recomputed from the saved state f, or read directly
    # from the forward kernel's emitted-u residual (d fields vs q).
    # Smagorinsky also needs rho and the deviations, so it always takes
    # the state residual.
    u = u2 = rho = None
    if f_ref is not None:
        if residual_u:
            u = [read_f(a) for a in range(d)]
            u2 = None
            for uc in u:
                u2 = uc * uc if u2 is None else u2 + uc * uc
        else:
            rho, u, u2 = _moments(read_f, q, e, d, dev_storage=False)

    if is3d:
        bys = by * S
        interior = (slice(1, 1 + bx), slice(yhalo, yhalo + bys))
        slab_val_shape = (bx + 2, yhalo + bys + yhalo, LANES)
    else:
        bys = None
        interior = (slice(1, 1 + bx), slice(None))
        slab_val_shape = (bx + 2, gslab.shape[-2], LANES)
    roll_masks = _RollMasks(slab_val_shape, S if is3d else
                            slab_val_shape[-2])

    def h_of(qi):
        """Adjoint-streamed cotangent h_i(y) = g_i(y + e_i) — the forward
        pull shift with e -> -e — with frozen-destination re-routing."""
        gi = gslab[qi]
        if gi.dtype != compute_dtype:
            gi = gi.astype(compute_dtype)
        ez = int(e[qi, d - 1])
        shifted = _roll_minor(gi, -ez, S if is3d else gi.shape[-2],
                              roll_masks)
        ex = int(e[qi, 0])
        if is3d:
            ey = int(e[qi, 1])
            shifted = shifted[1 + ex:1 + ex + bx,
                              yhalo + ey * S:yhalo + ey * S + bys]
        else:
            shifted = shifted[1 + ex:1 + ex + bx, :]
        if has_nsm:
            # out_i(x) = fpost_i(x - e_i (1 - nsm_i(x))): the cotangent of
            # a frozen destination flows to its own node, not upstream
            centre = gi[interior]
            shifted = jnp.where(nsm_s_ref[qi], 0.0, shifted) \
                + jnp.where(nsm_c_ref[qi], centre, 0.0)
        return shifted

    def partial_out(qi, h_i, h_opp, val):
        """Everything except the fluid-node moment term. ``val`` is the
        fluid diagonal part h - Mh; ``h_i`` routes identity (unclaimed
        masked) nodes; ``h_opp`` routes bounce-back nodes (their adjoint
        is the opposite re-route); equilibrium replacements are constant
        in f, so their adjoint is zero."""
        if has_ncm:
            val = jnp.where(ncm == 0, val, h_i)
            for bkind, index in boundary_kinds:
                if bkind == "bounce_back":
                    val = jnp.where(ncm == index, h_opp, val)
                else:
                    val = jnp.where(ncm == index, jnp.zeros_like(val), val)
        if val.dtype != out_ref.dtype:
            val = val.astype(out_ref.dtype)
        out_ref[qi] = val

    pairs, rest = _pairs_of(e, opposite)

    def apply_minor_fold():
        # ghost-image padding: fold the minor-axis ghost cotangents onto
        # their wrap sources and zero the bands, in VMEM (the jnp
        # alternative pays lane-misaligned relayout passes — measured
        # 4.6x at 256x256x250)
        if minor_fold is None:
            return
        for qi in range(q):
            v = out_ref[qi]
            out_ref[qi] = _minor_fold(v, minor_fold[0], minor_fold[1],
                                      S if is3d else v.shape[-2])

    if kind == "none":
        # NoCollision: J = I; the adjoint is the streaming transpose only
        for qp, qm in pairs:
            hp, hm = h_of(qp), h_of(qm)
            partial_out(qp, hp, hm, hp)
            partial_out(qm, hm, hp, hm)
        if rest is not None:
            h0 = h_of(rest)
            partial_out(rest, h0, h0, h0)
        apply_minor_fold()
        return

    # ------------------------------------------------------------------
    # t = M^T h, where M is the static relaxation matrix: tau_inv * I for
    # BGK, (cp + cm) I + (cp - cm) O for TRT (O = opposite permutation;
    # cp/cm absorb the 1/2 of the parity projectors, like the forward
    # fragment — both symmetric), or an arbitrary f-space matrix for the
    # "matvec" spec (folded MRT C = Minv diag(1/tau) M; regularized
    # C = I - (1 - 1/tau) P — transposed at build time). The full
    # transposed jacobian is then
    #   J^T h = h - t + K^T t
    # with K^T t the equilibrium-jacobian moments of t, so every
    # f-linear collision shares everything below.
    # ------------------------------------------------------------------
    hs = {}

    def h_at(qi):
        v = hs.get(qi)
        if v is None:
            v = hs[qi] = h_of(qi)
        return v

    extra_of = None   # per-pair (X_p, X_m) relaxation-derivative term
    extra_rest = None
    if kind == "bgk":
        tau_inv = spec[1]

        def t_at(qp, qm):
            return tau_inv * h_at(qp), tau_inv * h_at(qm)

        def t_rest(q0):
            return tau_inv * h_at(q0)
    elif kind == "smag":
        # Smagorinsky: f' = f - s(f) d, d = f - feq, with the per-cell
        # relaxation s = 1/tau_eff depending on f through the shear norm
        # R = |Pi/(2 rho cs^2)|^2 and the forward fragment's 2-step
        # fixed point tau_{k+1} = tau + a R / tau_k^2 (a = 3 C^2; the
        # constant term 3 nu + 1/2 equals tau). The transpose is the
        # BGK shape with per-cell t = s h, PLUS the derivative of s:
        #   X_j = D s^2 (dtau/dR) dR/df_j,   D = sum_i d_i h_i,
        #   dR/df_j = [e_j^T Pi e_j - cs^2 tr Pi - 2 (Pi u).e_j
        #              + u^T Pi u - P/rho] / (2 cs^4 rho^2)
        # (P = |Pi|^2; the feq-jacobian contraction collapses via the
        # closed-form second moment sum_i e e feq_i = rho (cs^2 I + uu)).
        _, tau0, const = spec
        inv_cs2 = 1.0 / cs2
        sym_pairs_s = [(a, b) for a in range(d) for b in range(a, d)]
        Pi = {p: None for p in sym_pairs_s}
        D = None
        for qp, qm in pairs:
            wq = float(w[qp])
            eu = None
            for a_ in range(d):
                ea_ = int(e[qp, a_])
                if ea_ == 0:
                    continue
                t_ = u[a_] if ea_ == 1 else -u[a_]
                eu = t_ if eu is None else eu + t_
            # even/odd split of the pair's equilibria: feq_{+-} = Ew +- Ow
            Ew = wq * rho * (1.0 + (0.5 * inv_cs2 * inv_cs2) * eu * eu
                             - (0.5 * inv_cs2) * u2)
            Ow = wq * rho * (inv_cs2 * eu)
            fp_, fm_ = read_f(qp), read_f(qm)
            dsum = (fp_ + fm_) - 2.0 * Ew      # d_p + d_m
            ddif = (fp_ - fm_) - 2.0 * Ow      # d_p - d_m
            hp_, hm_ = h_at(qp), h_at(qm)
            t_ = 0.5 * (dsum * (hp_ + hm_) + ddif * (hp_ - hm_))
            D = t_ if D is None else D + t_
            for (a_, b_) in sym_pairs_s:
                c_ = int(e[qp, a_]) * int(e[qp, b_])
                if c_ == 0:
                    continue
                t_ = dsum if c_ == 1 else -dsum
                Pi[(a_, b_)] = t_ if Pi[(a_, b_)] is None \
                    else Pi[(a_, b_)] + t_
        if rest is not None:
            d0 = read_f(rest) - float(w[rest]) * rho * (
                1.0 - (0.5 * inv_cs2) * u2)
            t_ = d0 * h_at(rest)
            D = t_ if D is None else D + t_

        P = None
        trPi = None
        for (a_, b_) in sym_pairs_s:
            v = Pi[(a_, b_)]
            if v is None:
                continue
            t_ = v * v if a_ == b_ else 2.0 * (v * v)
            P = t_ if P is None else P + t_
            if a_ == b_:
                trPi = v if trPi is None else trPi + v
        inv_rho = 1.0 / rho
        R = P * ((0.25 * inv_cs2 * inv_cs2) * inv_rho * inv_rho)
        a_c = 3.0 * const * const
        tau_c = tau0          # scalar, becomes a field after the 1st pass
        dtau = None           # dtau_k/dR
        for _k in range(2):
            inv_t2 = (1.0 / (tau_c * tau_c) if _k else 1.0 / (tau0 * tau0))
            new_dtau = a_c * inv_t2
            if dtau is not None:
                new_dtau = new_dtau - (2.0 * a_c) * R * inv_t2 \
                    * (1.0 / tau_c) * dtau
            dtau = new_dtau
            tau_c = tau0 + a_c * R * inv_t2
        s_field = 1.0 / tau_c
        Piu = []
        for a_ in range(d):
            acc = None
            for b_ in range(d):
                v = Pi[(a_, b_) if a_ <= b_ else (b_, a_)]
                if v is None:
                    continue
                t_ = u[b_] * v
                acc = t_ if acc is None else acc + t_
            Piu.append(acc)
        uPiu = None
        for a_ in range(d):
            if Piu[a_] is None:
                continue
            t_ = u[a_] * Piu[a_]
            uPiu = t_ if uPiu is None else uPiu + t_
        base = -cs2 * trPi - P * inv_rho
        if uPiu is not None:
            base = base + uPiu
        c0 = D * (s_field * s_field) * dtau \
            * ((0.5 * inv_cs2 * inv_cs2) * inv_rho * inv_rho)

        def t_at(qp, qm):
            return s_field * h_at(qp), s_field * h_at(qm)

        def t_rest(q0):
            return s_field * h_at(q0)

        def extra_of(qp):
            Geven = None
            for (a_, b_) in sym_pairs_s:
                c_ = int(e[qp, a_]) * int(e[qp, b_])
                v = Pi[(a_, b_)]
                if c_ == 0 or v is None:
                    continue
                coef = float(c_) if a_ == b_ else 2.0 * c_
                t_ = v * coef
                Geven = t_ if Geven is None else Geven + t_
            godd = None
            for a_ in range(d):
                ea_ = int(e[qp, a_])
                if ea_ == 0 or Piu[a_] is None:
                    continue
                t_ = Piu[a_] if ea_ == 1 else -Piu[a_]
                godd = t_ if godd is None else godd + t_
            even = base if Geven is None else base + Geven
            if godd is None:
                return c0 * even, c0 * even
            return c0 * (even - 2.0 * godd), c0 * (even + 2.0 * godd)

        extra_rest = c0 * base
    elif kind == "trt":
        _, tau_plus, tau_minus = spec
        cp, cm = 0.5 / tau_plus, 0.5 / tau_minus
        csum, cdif = cp + cm, cp - cm

        def t_at(qp, qm):
            hp, hm = h_at(qp), h_at(qm)
            return csum * hp + cdif * hm, csum * hm + cdif * hp

        def t_rest(q0):
            return (2.0 * cp) * h_at(q0)
    else:  # matvec: one pair-shared static matvec, like the forward MRT
        ts = build_pair_apply(np.asarray(spec[1], dtype=np.float64),
                              opposite)([h_at(qi) for qi in range(q)])

        def t_of(qi):
            # a structurally zero row would mean the collision output
            # ignores f entirely along qi; keep the algebra total anyway
            return ts[qi] if ts[qi] is not None else h_at(qi) * 0.0

        def t_at(qp, qm):
            return t_of(qp), t_of(qm)

        t_rest = t_of

    # weighted moments of t, pair-shared (e_a odd / e_a e_b even under
    # q -> qbar): S0, S1_a, S2_ab ride pair sums/diffs, one w multiply
    # per pair
    sym_pairs = [(a, b) for a in range(d) for b in range(a, d)]
    S0 = None
    S1 = [None] * d
    S2 = {p: None for p in sym_pairs}
    for qp, qm in pairs:
        hp, hm = h_at(qp), h_at(qm)
        tp, tm = t_at(qp, qm)
        partial_out(qp, hp, hm, hp - tp)
        partial_out(qm, hm, hp, hm - tm)
        wq = float(w[qp])
        ws = wq * (tp + tm)
        wd = wq * (tp - tm)
        S0 = ws if S0 is None else S0 + ws
        for a in range(d):
            ea = int(e[qp, a])
            if ea == 0:
                continue
            t = wd if ea == 1 else -wd
            S1[a] = t if S1[a] is None else S1[a] + t
        for (a, b) in sym_pairs:
            c = int(e[qp, a]) * int(e[qp, b])
            if c == 0:
                continue
            t = ws if c == 1 else -ws
            S2[(a, b)] = t if S2[(a, b)] is None else S2[(a, b)] + t
    if rest is not None:
        h0 = h_at(rest)
        t0 = t_rest(rest)
        partial_out(rest, h0, h0, h0 - t0)
        t = float(w[rest]) * t0
        S0 = t if S0 is None else S0 + t

    # A' + e_j . B from the moments and u (see module docstring)
    inv_cs2 = 1.0 / cs2

    def s2_at(a, b):
        return S2[(a, b) if a <= b else (b, a)]

    T = []  # T_a = sum_b u_b S2_ab
    for a in range(d):
        acc = None
        for b in range(d):
            v = s2_at(a, b)
            if v is None:
                continue
            t = u[b] * v
            acc = t if acc is None else acc + t
        T.append(acc)
    uS1 = None
    for a in range(d):
        if S1[a] is None:
            continue
        t = u[a] * S1[a]
        uS1 = t if uS1 is None else uS1 + t
    uuS2 = None
    for a in range(d):
        if T[a] is None:
            continue
        t = u[a] * T[a]
        uuS2 = t if uuS2 is None else uuS2 + t

    A = S0 * (1.0 - u2 * (0.5 * inv_cs2))
    if uS1 is not None:
        A = A + uS1 * inv_cs2
    if uuS2 is not None:
        A = A + uuS2 * (0.5 * inv_cs2 * inv_cs2)
    B = []
    for a in range(d):
        acc = -u[a] * S0
        if S1[a] is not None:
            acc = acc + S1[a]
        if T[a] is not None:
            acc = acc + T[a] * inv_cs2
        B.append(acc * inv_cs2)
    Ap = A
    for a in range(d):
        Ap = Ap - u[a] * B[a]

    # fluid-node moment term, pair-shared: delta(+-e) = A' +- e . B
    # (the relaxation scaling already lives in t)
    tAp = Ap
    tB = B

    def add_fluid(qi, delta):
        cur = out_ref[qi]
        if cur.dtype != compute_dtype:
            cur = cur.astype(compute_dtype)
        val = cur + delta if not has_ncm else \
            jnp.where(ncm == 0, cur + delta, cur)
        if val.dtype != out_ref.dtype:
            val = val.astype(out_ref.dtype)
        out_ref[qi] = val

    for qp, qm in pairs:
        eb = None
        for a in range(d):
            ea = int(e[qp, a])
            if ea == 0:
                continue
            t = tB[a] if ea == 1 else -tB[a]
            eb = t if eb is None else eb + t
        if extra_of is None:
            add_fluid(qp, tAp + eb)
            add_fluid(qm, tAp - eb)
        else:
            Xp, Xm = extra_of(qp)
            add_fluid(qp, tAp + eb + Xp)
            add_fluid(qm, tAp - eb + Xm)
    if rest is not None:
        add_fluid(rest, tAp if extra_rest is None else tAp + extra_rest)
    apply_minor_fold()


def fused_adjoint(f: jax.Array, g: jax.Array, e: np.ndarray, w: np.ndarray,
                  opposite: np.ndarray, cs: float,
                  spec: tuple,
                  no_collision_mask: Optional[jax.Array] = None,
                  no_streaming_mask: Optional[np.ndarray] = None,
                  no_streaming_shifted: Optional[jax.Array] = None,
                  boundary_kinds: Tuple[Tuple[str, int], ...] = (),
                  block_target: Tuple[int, int] = (16, 32),
                  block_target_2d: int = 128,
                  vmem_limit_mb: Optional[int] = None,
                  yhalo_rows: Optional[int] = None,
                  residual_u: bool = False,
                  minor_fold: Optional[Tuple[int, int]] = None,
                  interpret: bool = False) -> jax.Array:
    """Exact VJP of one fused collide-and-stream step.

    ``f`` is the residual saved by the forward pass — the step input
    state [q, ...], or with ``residual_u`` the pre-collision velocity
    [d, ...] emitted by the forward kernel (``emit_u``), which is all
    the equilibrium jacobian needs: backward traffic drops from 3q to
    2q + d fields. ``g`` is the cotangent of the step output; returns
    the cotangent of the step input. ``spec`` is the collision:
    ("bgk", tau_inv) | ("trt", tau_plus, tau_minus) | ("none",) |
    ("matvec", C_transposed) for any f-linear collision
    ``f' = f - C (f - feq)`` (folded MRT, regularized).
    ``no_streaming_mask`` must be a static (numpy) array — its adjoint
    re-routing pair ``nsm_i(y + e_i)`` is pre-shifted at trace time —
    UNLESS ``no_streaming_shifted`` provides that pair partner as a
    traced array (the sharded path: both are per-shard slabs of global
    host-precomputed masks, so the shift crosses shard boundaries
    correctly).
    """
    if spec[0] == "smag" and residual_u:
        raise ValueError("the smagorinsky adjoint needs the state "
                         "residual (rho and deviations), not emitted u")
    q = e.shape[0]
    shape = g.shape[1:]
    d = len(shape)
    bx, by, yhalo, S = plan_blocks(shape, q, g.dtype,
                                   block_target=block_target,
                                   block_target_2d=block_target_2d,
                                   yhalo_rows=yhalo_rows)

    if d == 2:
        YS = S
        bys = None
        grid = (shape[0] // bx,)
        merged_shape = (q, shape[0], S, LANES)
        out_block = (q, bx, S, LANES)
        out_index = lambda i: (_I0, i, _I0, _I0)
        mask_index = lambda i: (i, _I0, _I0)
    else:
        YS = shape[1] * S
        bys = by * S
        grid = (shape[0] // bx, shape[1] // by)
        merged_shape = (q, shape[0], YS, LANES)
        out_block = (q, bx, bys, LANES)
        out_index = lambda i, j: (_I0, i, j, _I0)
        mask_index = lambda i, j: (i, j, _I0)

    has_ncm = no_collision_mask is not None
    has_nsm = no_streaming_mask is not None

    g_specs = _halo_specs(shape[0], YS, bx, bys, lead_q=q, yhalo=yhalo)
    in_specs = list(g_specs)
    inputs = [g.reshape(merged_shape)] * len(g_specs)

    centre_spec = pl.BlockSpec(out_block, out_index,
                               memory_space=pltpu.VMEM)
    if spec[0] != "none":
        lead = f.shape[0]  # q, or d when the residual is the emitted u
        in_specs.append(pl.BlockSpec((lead,) + out_block[1:], out_index,
                                     memory_space=pltpu.VMEM))
        inputs.append(f.reshape((lead,) + merged_shape[1:]))
    if has_ncm:
        in_specs.append(pl.BlockSpec(out_block[1:], mask_index,
                                     memory_space=pltpu.VMEM))
        inputs.append(no_collision_mask.astype(jnp.int32).reshape(
            merged_shape[1:]))
    if has_nsm:
        if no_streaming_shifted is not None:
            mask_pair = (no_streaming_mask, no_streaming_shifted)
        else:
            nsm = np.asarray(no_streaming_mask)
            # static pre-shifts: nsm_i(y + e_i) per q (adjoint of the
            # destination-frozen select)
            mask_pair = (nsm, np.stack([
                np.roll(nsm[qi], tuple(-int(s) for s in e[qi]),
                        axis=tuple(range(d)))
                for qi in range(q)]))
        for m in mask_pair:
            in_specs.append(centre_spec)
            inputs.append(jnp.asarray(m).reshape(merged_shape))

    kernel = partial(
        _adjoint_kernel,
        e=e, w=w, opposite=opposite, cs=cs, spec=spec,
        bx=bx, by=by, S=S, has_ncm=has_ncm, has_nsm=has_nsm,
        boundary_kinds=tuple(boundary_kinds), yhalo=yhalo,
        residual_u=residual_u, minor_fold=minor_fold)

    compiler_params = None
    if vmem_limit_mb is not None:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)

    slab_rows = YS if d == 2 else bys + 2 * yhalo
    scratch = [pltpu.VMEM((q, bx + 2, slab_rows, LANES), g.dtype)]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(out_block, out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(merged_shape, g.dtype),
        scratch_shapes=scratch,
        compiler_params=compiler_params,
        interpret=interpret,
    )(*inputs)
    return out.reshape(g.shape)


def build_prestream(simulation, params, ncm):
    """The kernel's pointwise pre-streaming map as a jnp function:
    ``fpost(f) = boundary-composed collision``, mirroring the fused
    kernel's per-q pipeline (collide on fluid nodes, bounce-back from
    the RAW f's opposite, constant equilibrium replacements, identity
    on unclaimed masked nodes — i.e. hybrid-outlet nodes, which the
    kernel leaves frozen). Used by the SPLIT adjoint: collisions whose
    jacobian has no closed-form fragment (KBC's entropic stabiliser,
    analytic-moment MRT, velocity-dependent forcing) transpose as
    ``P^T . S^T`` — the streaming transpose runs the adjoint kernel
    with the ("none",) spec, then this map's ``jax.vjp`` applies the
    pointwise collision/boundary jacobian (elementwise, XLA-fused:
    no per-q rolls materialise, unlike the full jnp-step vjp)."""
    flow = simulation.flow
    collision = simulation.collision
    opposite = np.asarray(params["opposite"])
    boundary_kinds = params["boundary_kinds"]
    feq_boundary = params["feq_boundary"]
    feq_field = params.get("feq_field")

    def prestream(f):
        fpost = collision(flow.view(f))
        if ncm is not None:
            fpost = jnp.where(ncm == 0, fpost, f)
        for kind, index in boundary_kinds:
            if kind == "bounce_back":
                repl = f[opposite]
            elif kind == "equilibrium_pu":
                vals = jnp.asarray(feq_boundary[index - 1],
                                   dtype=f.dtype)
                repl = vals.reshape((-1,) + (1,) * (f.ndim - 1))
            else:  # equilibrium_pu_field — constant in f
                repl = jnp.asarray(feq_field, dtype=f.dtype)
            fpost = jnp.where(ncm == index, repl, fpost)
        return fpost

    return prestream


def build_adjoint_step(simulation, params, ncm, nsm, shape=None,
                       minor_fold=None, residual_u=None):
    """Closure ``adj(residual, ct) -> ct_f`` for ``build_fused_step``'s
    backward rule, or raise NotImplementedError when this configuration
    must fall back to the jnp vjp (hybrid outlets are excluded by the
    caller). ``adj.residual`` names what the forward must save: ``"u"``
    (the kernel's emitted pre-collision velocity) for BGK/TRT, ``None``
    for NoCollision. ``shape`` is the grid the adjoint runs on — the
    PADDED shape under ghost-image padding (``ncm``/``nsm`` must then
    be the padded masks; the caller composes the fold/zero-pad
    transposes around this kernel). ``residual_u=False`` forces the
    full state f as the residual (the hybrid-outlet backward stores f
    anyway for the window-replay vjp, so the d-field emitted-u residual
    would only add memory).

    Collisions without a closed-form jacobian fragment (KBC,
    analytic-moment MRT, forcing) take the SPLIT mode: the streaming
    transpose S^T runs the adjoint kernel with the ("none",) spec (nsm
    re-routing included, boundary routing excluded), then the pointwise
    pre-streaming map's ``jax.vjp`` applies P^T. Two memory-bound
    passes instead of one, still far from the full jnp-step vjp's
    per-q roll materialisation. Both folds under ghost-image padding
    commute with P^T (image cells replicate their sources' physics, so
    the pointwise jacobian is identical at image and source), so the
    minor fold stays in-kernel and the leading fold stays outside."""
    try:
        spec = adjoint_collision_spec(params)
        prestream = None
    except NotImplementedError:
        spec = ("none",)
        prestream = build_prestream(simulation, params, ncm)
    nsm_np = None
    if nsm is not None:
        nsm_np = np.asarray(nsm)

    kw = dict(e=params["e"], w=params["w"], opposite=params["opposite"],
              cs=params["cs"], spec=spec,
              boundary_kinds=(() if prestream is not None
                              else params["boundary_kinds"]),
              vmem_limit_mb=params.get("vmem_limit_mb"),
              block_target=params.get("block_target", (16, 32)),
              yhalo_rows=params.get("yhalo_rows"),
              # Smagorinsky needs rho and the deviations, so it always
              # takes the state residual
              residual_u=(spec[0] not in ("none", "smag")
                          if residual_u is None
                          else (residual_u and spec[0] != "smag")),
              minor_fold=minor_fold,
              interpret=params["interpret"])
    if prestream is not None:
        kw["residual_u"] = False
    # fail at build time, not first-backward time, if the plan is bad
    if shape is None:
        shape = tuple(simulation.flow.resolution)
    plan_blocks(tuple(shape),
                params["e"].shape[0], simulation.flow.f.dtype,
                block_target=kw["block_target"],
                yhalo_rows=kw["yhalo_rows"])

    if prestream is not None:
        def adj(res, ct):
            h = fused_adjoint(None, ct, no_collision_mask=None,
                              no_streaming_mask=nsm_np, **kw)
            _, vjp = jax.vjp(prestream, res)
            return vjp(h)[0]
        adj.residual = "f"
        adj.mode = "split"
        return adj

    def adj(res, ct):
        return fused_adjoint(res, ct, no_collision_mask=ncm,
                             no_streaming_mask=nsm_np, **kw)
    adj.residual = ("u" if kw["residual_u"] else
                    ("f" if spec[0] != "none" else None))
    adj.mode = "full"
    return adj


# ---------------------------------------------------------------------------
# Temporally-blocked adjoint: the backward pass of n_sub fused sub-steps in
# ONE memory-bound launch (VERDICT r4 #3). Recompute-in-block strategy: the
# kernel reads the launch-input state f with a 2(n_sub-1)-deep halo, replays
# the forward sub-steps entirely in VMEM storing only each sub-step's
# pre-collision velocity (d fields per level), then runs the adjoint sweep
# backward through the stored levels, ping-ponging the cotangent between the
# (by then free) forward slabs. HBM traffic per simulation step drops from
# the single-step adjoint's 3q fields to ~(2q + q)/n_sub + boundary halos.
# Periodic configurations only (masks/boundaries/hybrid outlets keep the
# single-step adjoint), matching the forward temporal-blocking gate.
# ---------------------------------------------------------------------------

def _transpose_collide_slab(h, u, u2, e, w, opposite, cs, spec):
    """(J^T h) for one sub-step on full-slab arrays: h[qi] is the
    adjoint-streamed cotangent h_i(x) = g_i(x + e_i), u the level's
    pre-collision velocity. Same pair-shared algebra as
    ``_adjoint_kernel`` (t = M^T h; weighted moments S0/S1/S2; A' + e.B)
    without mask/boundary routing."""
    q = e.shape[0]
    d = len(u)
    cs2 = cs * cs
    kind = spec[0]
    pairs, rest = _pairs_of(e, opposite)

    if kind == "none":
        return [h[qi] for qi in range(q)]

    if kind == "bgk":
        tau_inv = spec[1]

        def t_at(qp, qm):
            return tau_inv * h[qp], tau_inv * h[qm]

        def t_rest(q0):
            return tau_inv * h[q0]
    elif kind == "trt":
        _, tau_plus, tau_minus = spec
        cp, cm = 0.5 / tau_plus, 0.5 / tau_minus
        csum, cdif = cp + cm, cp - cm

        def t_at(qp, qm):
            hp, hm = h[qp], h[qm]
            return csum * hp + cdif * hm, csum * hm + cdif * hp

        def t_rest(q0):
            return (2.0 * cp) * h[q0]
    else:  # matvec (folded MRT / regularized), transposed at build time
        ts = build_pair_apply(np.asarray(spec[1], dtype=np.float64),
                              opposite)([h[qi] for qi in range(q)])

        def t_of(qi):
            return ts[qi] if ts[qi] is not None else h[qi] * 0.0

        def t_at(qp, qm):
            return t_of(qp), t_of(qm)

        t_rest = t_of

    out = [None] * q
    sym_pairs = [(a, b) for a in range(d) for b in range(a, d)]
    S0 = None
    S1 = [None] * d
    S2 = {p: None for p in sym_pairs}
    for qp, qm in pairs:
        tp, tm = t_at(qp, qm)
        out[qp] = h[qp] - tp
        out[qm] = h[qm] - tm
        wq = float(w[qp])
        ws = wq * (tp + tm)
        wd = wq * (tp - tm)
        S0 = ws if S0 is None else S0 + ws
        for a in range(d):
            ea = int(e[qp, a])
            if ea == 0:
                continue
            t = wd if ea == 1 else -wd
            S1[a] = t if S1[a] is None else S1[a] + t
        for (a, b) in sym_pairs:
            c = int(e[qp, a]) * int(e[qp, b])
            if c == 0:
                continue
            t = ws if c == 1 else -ws
            S2[(a, b)] = t if S2[(a, b)] is None else S2[(a, b)] + t
    if rest is not None:
        t0 = t_rest(rest)
        out[rest] = h[rest] - t0
        t = float(w[rest]) * t0
        S0 = t if S0 is None else S0 + t

    inv_cs2 = 1.0 / cs2

    def s2_at(a, b):
        return S2[(a, b) if a <= b else (b, a)]

    T = []
    for a in range(d):
        acc = None
        for b in range(d):
            v = s2_at(a, b)
            if v is None:
                continue
            t = u[b] * v
            acc = t if acc is None else acc + t
        T.append(acc)
    uS1 = None
    for a in range(d):
        if S1[a] is None:
            continue
        t = u[a] * S1[a]
        uS1 = t if uS1 is None else uS1 + t
    uuS2 = None
    for a in range(d):
        if T[a] is None:
            continue
        t = u[a] * T[a]
        uuS2 = t if uuS2 is None else uuS2 + t

    A = S0 * (1.0 - u2 * (0.5 * inv_cs2))
    if uS1 is not None:
        A = A + uS1 * inv_cs2
    if uuS2 is not None:
        A = A + uuS2 * (0.5 * inv_cs2 * inv_cs2)
    B = []
    for a in range(d):
        acc = -u[a] * S0
        if S1[a] is not None:
            acc = acc + S1[a]
        if T[a] is not None:
            acc = acc + T[a] * inv_cs2
        B.append(acc * inv_cs2)
    Ap = A
    for a in range(d):
        Ap = Ap - u[a] * B[a]

    for qp, qm in pairs:
        eb = None
        for a in range(d):
            ea = int(e[qp, a])
            if ea == 0:
                continue
            t = B[a] if ea == 1 else -B[a]
            eb = t if eb is None else eb + t
        out[qp] = out[qp] + (Ap + eb)
        out[qm] = out[qm] + (Ap - eb)
    if rest is not None:
        out[rest] = out[rest] + Ap
    return out


def plan_adjoint_multi(shape, q, dtype, n_sub: int,
                       block_target=(16, 32), block_target_2d: int = 128):
    """(bx, by, S, xhalo, yhalo) for the blocked adjoint, or raise
    NotImplementedError. The slab halo must cover BOTH the backward
    cotangent cone (n_sub) and the forward-recompute cone for the
    deepest level's velocity (2(n_sub-1)); it must also divide the
    block extent (halo index maps run in whole halo-block units)."""
    d = len(shape)
    bx, by, yhalo0, S = plan_blocks(shape, q, dtype,
                                    block_target=block_target,
                                    block_target_2d=block_target_2d)
    need_x = max(n_sub, 2 * (n_sub - 1))
    xhalo = need_x
    while bx % xhalo != 0:
        xhalo += 1
        if xhalo > bx:
            raise NotImplementedError(
                f"no x-halo depth >= {need_x} divides bx={bx}")
    if d == 2:
        return bx, None, S, xhalo, None
    need_rows = need_x * S
    yhalo = ((need_rows + 7) // 8) * 8
    while yhalo % S != 0 or (by * S) % yhalo != 0:
        yhalo += 8
        if yhalo > by * S:
            raise NotImplementedError(
                f"no y-halo depth >= {need_rows} rows divides bys={by * S}")
    return bx, by, S, xhalo, yhalo


def _adjoint_multi_kernel(*refs, e: np.ndarray, w: np.ndarray,
                          opposite: np.ndarray, cs: float,
                          fwd_spec: tuple, adj_spec: tuple,
                          bx: int, by: Optional[int], S: int,
                          xhalo: int, yhalo: Optional[int], n_sub: int):
    q = e.shape[0]
    is3d = by is not None
    d = 3 if is3d else 2
    n_parts = 9 if is3d else 3

    f_parts = refs[:n_parts]
    g_parts = refs[n_parts:2 * n_parts]
    out_ref = refs[2 * n_parts]
    slab_a = refs[2 * n_parts + 1]
    slab_b = refs[2 * n_parts + 2]
    u_ref = refs[2 * n_parts + 3]   # (n_sub * d, X_s, R_s, LANES)

    bys = by * S if is3d else None
    _store_parts(f_parts, slab_a, is3d, bx, bys,
                 yhalo=yhalo if is3d else 0, xhalo=xhalo)

    X_s = slab_a.shape[1]
    R_s = slab_a.shape[2]
    compute_dtype = slab_a.dtype
    roll_masks = _RollMasks((X_s, R_s, LANES), S if is3d else R_s)
    slabs = [slab_a, slab_b]

    # ---- forward recompute: store each level's pre-collision velocity
    from .stream_collide import _make_collide
    for k in range(n_sub):
        cur = slabs[k % 2]
        nxt = slabs[(k + 1) % 2]

        def read(qi, _cur=cur):
            return _cur[qi]

        rho, u, u2 = _moments(read, q, e, d, dev_storage=False)
        for a in range(d):
            u_ref[k * d + a] = u[a]
        if k == n_sub - 1:
            break  # only its velocity is needed; f_{n_sub} never is
        fpost_of = _make_collide(fwd_spec, e, w, opposite, cs, d,
                                 rho, u, u2, read, False)
        m = k + 1
        for qi in range(q):
            fpost = fpost_of(qi)
            ez = int(e[qi, d - 1])
            shifted = _roll_minor(fpost, ez, S if is3d else R_s,
                                  roll_masks)
            ex = int(e[qi, 0])
            if is3d:
                ey = int(e[qi, 1])
                xs0, xs1 = m, X_s - m
                rs0, rs1 = m * S, R_s - m * S
                nxt[qi, xs0:xs1, rs0:rs1] = shifted[
                    xs0 - ex:xs1 - ex, rs0 - ey * S:rs1 - ey * S]
            else:
                xs0, xs1 = m, X_s - m
                nxt[qi, xs0:xs1] = shifted[xs0 - ex:xs1 - ex]

    # ---- backward sweep: h ping-pongs through the (now free) slabs
    h_slab = slabs[(n_sub - 1) % 2]   # holds f_{n_sub-1}; overwrite with g
    _store_parts(g_parts, h_slab, is3d, bx, bys,
                 yhalo=yhalo if is3d else 0, xhalo=xhalo)
    h_cur = h_slab
    h_nxt = slabs[n_sub % 2]
    for kk in range(n_sub - 1, -1, -1):
        m = n_sub - kk
        if is3d:
            xs0, xs1 = m, X_s - m
            rs0, rs1 = m * S, R_s - m * S
        else:
            xs0, xs1 = m, X_s - m
            rs0, rs1 = 0, R_s
        # adjoint stream: h_i(x) = h_next_i(x + e_i)
        h = {}
        for qi in range(q):
            gi = h_cur[qi]
            ez = int(e[qi, d - 1])
            shifted = _roll_minor(gi, -ez, S if is3d else R_s, roll_masks)
            ex = int(e[qi, 0])
            if is3d:
                ey = int(e[qi, 1])
                h[qi] = shifted[xs0 + ex:xs1 + ex,
                                rs0 + ey * S:rs1 + ey * S]
            else:
                h[qi] = shifted[xs0 + ex:xs1 + ex]
        uk = [u_ref[kk * d + a, xs0:xs1, rs0:rs1] if is3d
              else u_ref[kk * d + a, xs0:xs1] for a in range(d)]
        u2k = None
        for uc in uk:
            u2k = uc * uc if u2k is None else u2k + uc * uc
        ct = _transpose_collide_slab(h, uk, u2k, e, w, opposite, cs,
                                     adj_spec)
        if kk == 0:
            for qi in range(q):
                if is3d:
                    v = ct[qi][xhalo - m:xhalo - m + bx,
                               yhalo - rs0:yhalo - rs0 + bys]
                else:
                    v = ct[qi][xhalo - m:xhalo - m + bx]
                if v.dtype != out_ref.dtype:
                    v = v.astype(out_ref.dtype)
                out_ref[qi] = v
        else:
            for qi in range(q):
                if is3d:
                    h_nxt[qi, xs0:xs1, rs0:rs1] = ct[qi]
                else:
                    h_nxt[qi, xs0:xs1] = ct[qi]
            h_cur, h_nxt = h_nxt, h_cur


def fused_adjoint_multi(f: jax.Array, g: jax.Array, e: np.ndarray,
                        w: np.ndarray, opposite: np.ndarray, cs: float,
                        fwd_spec: tuple, adj_spec: tuple, n_sub: int,
                        block_target: Tuple[int, int] = (16, 32),
                        block_target_2d: int = 128,
                        vmem_limit_mb: Optional[int] = None,
                        interpret: bool = False) -> jax.Array:
    """Exact VJP of ``n_sub`` fused collide-and-stream sub-steps (the
    temporally-blocked forward launch) in one Pallas pass. ``f`` is the
    LAUNCH input state (the only residual); ``g`` the cotangent of the
    launch output. Periodic configurations, f-linear collisions
    (BGK / TRT / folded MRT / regularized / none) only."""
    q = e.shape[0]
    shape = g.shape[1:]
    d = len(shape)
    bx, by, S, xhalo, yhalo = plan_adjoint_multi(
        shape, q, g.dtype, n_sub, block_target=block_target,
        block_target_2d=block_target_2d)

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

    specs = _halo_specs(shape[0], YS, bx, bys, lead_q=q,
                        yhalo=yhalo if d == 3 else YHALO, xhalo=xhalo)
    in_specs = list(specs) + list(specs)
    inputs = ([f.reshape(merged_shape)] * len(specs)
              + [g.reshape(merged_shape)] * len(specs))

    kernel = partial(
        _adjoint_multi_kernel,
        e=e, w=w, opposite=opposite, cs=cs,
        fwd_spec=fwd_spec, adj_spec=adj_spec,
        bx=bx, by=by, S=S, xhalo=xhalo,
        yhalo=yhalo if d == 3 else None, n_sub=n_sub)

    compiler_params = None
    if vmem_limit_mb is not None:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)

    slab_rows = YS if d == 2 else bys + 2 * yhalo
    slab_shape = (q, bx + 2 * xhalo, slab_rows, LANES)
    d_dim = d
    scratch = [pltpu.VMEM(slab_shape, g.dtype),
               pltpu.VMEM(slab_shape, g.dtype),
               pltpu.VMEM((n_sub * d_dim,) + slab_shape[1:], g.dtype)]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(out_block, out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(merged_shape, g.dtype),
        scratch_shapes=scratch,
        compiler_params=compiler_params,
        interpret=interpret,
    )(*inputs)
    return out.reshape(g.shape)
