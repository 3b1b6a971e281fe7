"""Moment transforms for MRT-type collisions.

Parity with reference ``/root/reference/lettuce/util/moments.py``:
``moment_tensor``, ``get_default_moment_transform``, the ``Transform``
protocol and the concrete D1Q3 (natural moments), D2Q9 Lallemand, D2Q9
Dellar and D3Q27 Hermite transforms.

Unlike the reference (hand-typed rational matrices), every matrix here is
*generated* from its defining polynomial basis evaluated on the stencil
velocities, and the inverse is computed numerically — same values, no
transcription risk:

  * D1Q3: natural moments e^0, e^1, e^2;
  * D2Q9 Lallemand & Luo (2000): [1, ex, ey, ex^2-ey^2, ex ey,
    -4+3|e|^2, (-5+3|e|^2) ex, (-5+3|e|^2) ey, 4 - 21/2 |e|^2 + 9/2 |e|^4];
  * D2Q9 Dellar (2002): [1, ex, ey, (9 ex^2 - 3)/2, 9 ex ey,
    (9 ey^2 - 3)/2, N(|e|^2), (6|e|^2 - 8) ex, (6|e|^2 - 8) ey];
  * D3Q27 Hermite: tensor products of H0 = 1, H1 = e, H2 = e^2 - cs^2.
"""

from __future__ import annotations

import warnings
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..stencil import D1Q3, D2Q9, D3Q19, D3Q27, Stencil
from .utility import InefficientCodeWarning, LettuceException, \
    ExperimentalWarning

__all__ = ["moment_tensor", "get_default_moment_transform", "Transform",
           "D1Q3Transform", "D2Q9Lallemand", "D2Q9Dellar", "D3Q27Hermite",
           "D3Q19DHumieres", "D3Q27CumulantTransform"]


def moment_tensor(e, multiindex):
    """prod_a e_a^multiindex_a for each (multiindex row, velocity)."""
    e = np.asarray(e)
    multiindex = np.asarray(multiindex)
    return np.prod(np.power(e, multiindex[..., None, :]), axis=-1)


def get_default_moment_transform(stencil: "Stencil", context: "Context"):
    if stencil == D1Q3 or isinstance(stencil, D1Q3):
        return D1Q3Transform(stencil if isinstance(stencil, Stencil)
                             else stencil(), context)
    if stencil == D2Q9 or isinstance(stencil, D2Q9):
        return D2Q9Lallemand(stencil if isinstance(stencil, Stencil)
                             else stencil(), context)
    if stencil == D3Q19 or isinstance(stencil, D3Q19):
        # beyond the reference: its d'Humieres draft is commented out
        return D3Q19DHumieres(stencil if isinstance(stencil, Stencil)
                              else stencil(), context)
    raise LettuceException(
        f"No default moment transform for lattice {stencil}.")


class Transform:
    """Moment (or cumulant) transform protocol: ``transform`` /
    ``inverse_transform`` / ``equilibrium`` (in moment space)."""

    names: List[str] = None
    supported_stencils: List[type] = []

    def __init__(self, stencil: "Stencil", context: "Context" = None,
                 names=None):
        self.context = context
        self.stencil = stencil
        self.names = ([f"m{i}" for i in range(stencil.q)]
                      if names is None else names)

    def __getitem__(self, moment_names):
        if not isinstance(moment_names, tuple):
            moment_names = [moment_names]
        return [self.names.index(name) for name in moment_names]

    def transform(self, f):
        return f

    def inverse_transform(self, m):
        return m

    def equilibrium(self, m: jax.Array, flow: "Flow"):
        """Fallback: roundtrip through f-space (inefficient, warns)."""
        warnings.warn(
            "Transform.equilibrium is a poor man's implementation of the "
            "moment equilibrium. Please consider implementing the "
            "equilibrium moments for your transform by hand.",
            InefficientCodeWarning)
        f = self.inverse_transform(m)
        feq = flow.equilibrium(flow, flow.rho(f), flow.u(f))
        return self.transform(feq)

    def _mv(self, matrix, v):
        return jnp.tensordot(matrix, v, axes=1)


class _MatrixTransform(Transform):
    """Linear transform defined by a generated moment matrix."""

    def __init__(self, stencil: "Stencil", context: "Context" = None,
                 names=None):
        super().__init__(stencil, context, names or type(self).names)
        matrix = self._build_matrix(np.asarray(stencil.e, dtype=np.float64))
        inverse = np.linalg.inv(matrix)
        dtype = context.dtype if context is not None else jnp.float64
        self.matrix = jnp.asarray(matrix, dtype=dtype)
        self.inverse = jnp.asarray(inverse, dtype=dtype)

    @staticmethod
    def _build_matrix(e: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def transform(self, f):
        return self._mv(self.matrix, f)

    def inverse_transform(self, m):
        return self._mv(self.inverse, m)


class D1Q3Transform(_MatrixTransform):
    """Natural moments rho, j, e = e^0, e^1, e^2."""

    names = ["rho", "j", "e"]
    supported_stencils = [D1Q3]

    @staticmethod
    def _build_matrix(e):
        ex = e[:, 0]
        return np.stack([np.ones_like(ex), ex, ex ** 2])


class D2Q9Dellar(_MatrixTransform):
    """Dellar (2002) basis: rho / j / Pi / N / J."""

    names = ["rho", "jx", "jy", "Pi_xx", "Pi_xy", "PI_yy", "N", "Jx", "Jy"]
    supported_stencils = [D2Q9]

    @staticmethod
    def _build_matrix(e):
        ex, ey = e[:, 0], e[:, 1]
        s = ex ** 2 + ey ** 2
        return np.stack([
            np.ones_like(ex),
            ex,
            ey,
            (9 * ex ** 2 - 3) / 2,
            9 * ex * ey,
            (9 * ey ** 2 - 3) / 2,
            4.5 * s ** 2 - 7.5 * s + 1,
            (6 * s - 8) * ex,
            (6 * s - 8) * ey,
        ])

    def equilibrium(self, m, flow: "Flow"):
        warnings.warn("I am not 100% sure if this equilibrium is correct.",
                      ExperimentalWarning)
        rho, jx, jy = m[0], m[1], m[2]
        zeros = jnp.zeros_like(rho)
        return jnp.stack([
            rho, jx, jy,
            jx * jx / rho * 9 / 2,
            jx * jy / rho * 9,
            jy * jy / rho * 9 / 2,
            zeros, zeros, zeros,
        ])


class D2Q9Lallemand(_MatrixTransform):
    """Classic Lallemand & Luo (2000) basis."""

    names = ["rho", "jx", "jy", "pxx", "pxy", "e", "qx", "qy", "eps"]
    supported_stencils = [D2Q9]

    @staticmethod
    def _build_matrix(e):
        ex, ey = e[:, 0], e[:, 1]
        s = ex ** 2 + ey ** 2
        return np.stack([
            np.ones_like(ex),
            ex,
            ey,
            ex ** 2 - ey ** 2,
            ex * ey,
            -4 + 3 * s,
            (-5 + 3 * s) * ex,
            (-5 + 3 * s) * ey,
            4 - 10.5 * s + 4.5 * s ** 2,
        ])

    def equilibrium(self, m, flow: "Flow"):
        """From Lallemand and Luo."""
        warnings.warn("I am not 100% sure if this equilibrium is correct.",
                      ExperimentalWarning)
        rho, jx, jy = m[0], m[1], m[2]
        c1, alpha2, alpha3 = -2, -8, 4
        gamma1, gamma2, gamma3, gamma4 = 2 / 3, 18, 2 / 3, -18
        j2 = jx ** 2 + jy ** 2
        return jnp.stack([
            rho, jx, jy,
            1 / 2 * gamma1 * (jx ** 2 - jy ** 2),
            1 / 2 * gamma3 * (jx * jy),
            1 / 4 * alpha2 * rho + 1 / 6 * gamma2 * j2,
            1 / 2 * c1 * jx,
            1 / 2 * c1 * jy,
            1 / 4 * alpha3 * rho + 1 / 6 * gamma4 * j2,
        ])


# multi-index order of the reference's 27 Hermite moments
_HERMITE_MULTIINDICES = [
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1), (0, 0, 2),
    (2, 1, 0), (2, 0, 1), (1, 2, 0), (1, 1, 1), (1, 0, 2), (0, 2, 1),
    (0, 1, 2),
    (2, 2, 0), (2, 1, 1), (2, 0, 2), (1, 2, 1), (1, 1, 2), (0, 2, 2),
    (2, 2, 1), (2, 1, 2), (1, 2, 2), (2, 2, 2),
]


class D3Q27Hermite(_MatrixTransform):
    """Tensor-Hermite moments: products of H0=1, H1=e, H2=e^2 - cs^2."""

    names = ['rho', 'jx', 'jy', 'jz',
             'Pi_xx', 'Pi_xy', 'PI_xz', 'PI_yy', 'PI_yz', 'PI_zz',
             'J_xxy', 'J_xxz', 'J_xyy', 'J_xyz', 'J_xzz', 'J_yyz', 'J_yzz',
             'J_xxyy', 'J_xxyz', 'J_xxzz', 'J_xyyz', 'J_xyzz', 'J_yyzz',
             'J_xxyyz', 'J_xxyzz', 'J_xyyzz', 'J_xyxzyz']
    supported_stencils = [D3Q27]

    @staticmethod
    def _build_matrix(e):
        cs2 = 1.0 / 3.0

        def hermite(x, order):
            if order == 0:
                return np.ones_like(x)
            if order == 1:
                return x
            return x ** 2 - cs2

        rows = []
        for (i, j, k) in _HERMITE_MULTIINDICES:
            rows.append(hermite(e[:, 0], i) * hermite(e[:, 1], j)
                        * hermite(e[:, 2], k))
        return np.stack(rows)

    def equilibrium(self, m, flow: "Flow"):
        rho, jx, jy, jz = m[0], m[1], m[2], m[3]
        j = {'x': jx, 'y': jy, 'z': jz}
        rows = [rho, jx, jy, jz]
        for (i, jj, k) in _HERMITE_MULTIINDICES[4:]:
            # equilibrium Hermite moment = product of momenta / rho^(n-1)
            order = i + jj + k
            val = (j['x'] ** i * j['y'] ** jj * j['z'] ** k
                   / rho ** (order - 1))
            rows.append(val)
        return jnp.stack(rows)


# --------------------------------------------------------------------------
# D3Q27 cumulant transform (Geier et al. 2015)
# --------------------------------------------------------------------------
# The reference carries this only as a commented-out draft
# (/root/reference/lettuce/util/moments.py:276-366, explicitly unfinished).
# Instead of transcribing the published central-moment<->cumulant relations
# (a notorious source of coefficient typos), both directions are DERIVED
# symbolically at build time from the generating-function definitions:
#
#   G(xi)  = (1/rho) sum_abc kappa_abc xi_x^a xi_y^b xi_z^c / (a! b! c!)
#   c_abc  = a! b! c! [xi^abc] log G          (normalized cumulants, C/rho)
#   n_abc  = a! b! c! [xi^abc] exp(L),  L = sum c_abc xi^abc / (a! b! c!)
#
# using exact Fraction arithmetic over truncated power series (exponents
# capped at 2 per axis — the D3Q27 raw-moment basis). First-order central
# moments vanish identically in the comoving frame (u = j/rho), so the
# series start at total degree 2 and log/exp need only three terms.
# The derivation reproduces e.g. Geier's
#   C_220 = kappa_220 - (kappa_200 kappa_020 + 2 kappa_110^2)/rho
# exactly, with zero transcription risk for the 5th/6th-order relations.

_CUM_IDXS = [(a, b, c) for a in range(3) for b in range(3) for c in range(3)]


def _series_mul(A, B):
    """Multiply truncated power series in xi whose coefficients are
    polynomials over symbols: dict[idx] -> dict[monomial] -> Fraction,
    monomial = sorted tuple of symbol indices. Exponents above 2 per axis
    can never fall back below 2, so dropping them is exact."""
    out = {}
    for ea, ma in A.items():
        for eb, mb in B.items():
            ec = (ea[0] + eb[0], ea[1] + eb[1], ea[2] + eb[2])
            if max(ec) > 2:
                continue
            dst = out.setdefault(ec, {})
            for mono_a, ca in ma.items():
                for mono_b, cb in mb.items():
                    mono = tuple(sorted(mono_a + mono_b))
                    dst[mono] = dst.get(mono, 0) + ca * cb
    return out


def _series_sum(series_list, coeffs):
    out = {}
    for series, c in zip(series_list, coeffs):
        for idx, monos in series.items():
            dst = out.setdefault(idx, {})
            for mono, v in monos.items():
                dst[mono] = dst.get(mono, 0) + c * v
    return out


def _derive_cumulant_relations():
    """Returns (to_cum, from_cum): for each multi-index of total order
    >= 2, a list of (float coefficient, tuple of source multi-indices)
    whose evaluated sum gives the normalized cumulant (resp. normalized
    central moment) at that index."""
    from fractions import Fraction
    from math import factorial

    def fct(idx):
        return Fraction(1, factorial(idx[0]) * factorial(idx[1])
                        * factorial(idx[2]))

    active = [idx for idx in _CUM_IDXS if sum(idx) >= 2]
    # N = G - 1 with symbols n_idx (kappa/rho); first order dropped (== 0)
    N = {idx: {(idx,): fct(idx)} for idx in active}
    N2 = _series_mul(N, N)
    N3 = _series_mul(N2, N)
    logG = _series_sum([N, N2, N3],
                       [Fraction(1), Fraction(-1, 2), Fraction(1, 3)])
    # L with symbols c_idx; exp(L) - 1 = L + L^2/2 + L^3/6
    L = {idx: {(idx,): fct(idx)} for idx in active}
    L2 = _series_mul(L, L)
    L3 = _series_mul(L2, L)
    expL = _series_sum([L, L2, L3],
                       [Fraction(1), Fraction(1, 2), Fraction(1, 6)])

    def extract(series):
        rel = {}
        for idx in active:
            inv_f = 1 / fct(idx)
            terms = [(float(coeff * inv_f), mono)
                     for mono, coeff in series.get(idx, {}).items()
                     if coeff != 0]
            rel[idx] = terms
        return rel

    return extract(logG), extract(expL)


class D3Q27CumulantTransform(Transform):
    """Cumulant transform for D3Q27 (Geier, Schönherr, Pasquali, Krafczyk
    2015): raw moments -> central moments (binomial velocity shift) ->
    cumulants (derived log-series relations). Nonlinear, so it does not
    subclass _MatrixTransform; it plugs into ``MRTCollision`` through the
    generic Transform protocol, completing the component the reference
    left as a commented-out draft (``moments.py:276-366``).

    Vector layout: 27 slots ordered by multi-index (a, b, c) in
    ``_CUM_IDXS`` (lexicographic, exponents 0..2 per axis). The comoving
    first-order cumulants vanish identically, so those slots carry the
    conserved momenta j = rho u instead (and slot (0,0,0) carries rho) —
    making the transform invertible without side information.
    """

    supported_stencils = [D3Q27]

    def __init__(self, stencil: "Stencil", context: "Context" = None,
                 names=None):
        if names is None:
            names = []
            for idx in _CUM_IDXS:
                if idx == (0, 0, 0):
                    names.append("rho")
                elif sum(idx) == 1:
                    names.append("j" + "xyz"[idx.index(1)])
                else:
                    names.append("C_" + "".join(str(i) for i in idx))
        super().__init__(stencil, context, names)
        e = np.asarray(stencil.e, dtype=np.float64)
        M = moment_tensor(e, np.asarray(_CUM_IDXS))
        dtype = context.dtype if context is not None else jnp.float64
        self.matrix = jnp.asarray(M, dtype=dtype)
        self.inverse = jnp.asarray(np.linalg.inv(M), dtype=dtype)
        self._to_cum, self._from_cum = _derive_cumulant_relations()
        self._slot = {idx: i for i, idx in enumerate(_CUM_IDXS)}

    # -- binomial velocity shift (exact, per-axis Horner form) ---------
    @staticmethod
    def _shift(mom, u, sign):
        """Central<->raw shift along all axes: kappa_a = sum_{p<=a}
        C(a,p) (sign*u)^(a-p) m_p, applied per axis (a in 0..2)."""
        for axis in range(3):
            ua = sign * u[axis]
            ua2 = ua * ua
            new = dict(mom)
            for idx, val in mom.items():
                if idx[axis] == 1:
                    lower = list(idx)
                    lower[axis] = 0
                    new[idx] = val + ua * mom[tuple(lower)]
                elif idx[axis] == 2:
                    l1 = list(idx)
                    l1[axis] = 1
                    l0 = list(idx)
                    l0[axis] = 0
                    new[idx] = (val + 2.0 * ua * mom[tuple(l1)]
                                + ua2 * mom[tuple(l0)])
            mom = new
        return mom

    @staticmethod
    def _eval_relations(rel, src, rho):
        out = {}
        for idx, terms in rel.items():
            acc = None
            for coeff, mono in terms:
                prod = None
                for s in mono:
                    prod = src[s] if prod is None else prod * src[s]
                term = coeff * prod if coeff != 1.0 else prod
                acc = term if acc is None else acc + term
            out[idx] = rho * acc if acc is not None else jnp.zeros_like(rho)
        return out

    def transform(self, f):
        m = self._mv(self.matrix.astype(f.dtype), f)
        mom = {idx: m[self._slot[idx]] for idx in _CUM_IDXS}
        rho = mom[(0, 0, 0)]
        inv_rho = 1.0 / rho
        j = [mom[(1, 0, 0)], mom[(0, 1, 0)], mom[(0, 0, 1)]]
        u = [ja * inv_rho for ja in j]
        kap = self._shift(mom, u, -1.0)
        n = {idx: kap[idx] * inv_rho for idx in _CUM_IDXS if sum(idx) >= 2}
        cum = self._eval_relations(self._to_cum, n, rho)
        out = [None] * len(_CUM_IDXS)
        for i, idx in enumerate(_CUM_IDXS):
            if idx == (0, 0, 0):
                out[i] = rho
            elif sum(idx) == 1:
                out[i] = j[[(1, 0, 0), (0, 1, 0), (0, 0, 1)].index(idx)]
            else:
                out[i] = cum[idx]
        return jnp.stack(out)

    def inverse_transform(self, c):
        rho = c[self._slot[(0, 0, 0)]]
        inv_rho = 1.0 / rho
        j = [c[self._slot[(1, 0, 0)]], c[self._slot[(0, 1, 0)]],
             c[self._slot[(0, 0, 1)]]]
        u = [ja * inv_rho for ja in j]
        cn = {idx: c[self._slot[idx]] * inv_rho
              for idx in _CUM_IDXS if sum(idx) >= 2}
        kap = self._eval_relations(self._from_cum, cn, rho)
        zero = jnp.zeros_like(rho)
        mom = {}
        for idx in _CUM_IDXS:
            if idx == (0, 0, 0):
                mom[idx] = rho
            elif sum(idx) == 1:
                mom[idx] = zero  # comoving first-order central moments
            else:
                mom[idx] = kap[idx]
        raw = self._shift(mom, u, +1.0)
        # restore the conserved momenta exactly (the shift reconstructs
        # m_100 = rho u_x from kappa_100 = 0; use the stored j instead)
        raw[(1, 0, 0)], raw[(0, 1, 0)], raw[(0, 0, 1)] = j
        m = jnp.stack([raw[idx] for idx in _CUM_IDXS])
        return self._mv(self.inverse.astype(m.dtype), m)

    def equilibrium(self, m, flow: "Flow" = None):
        """Maxwellian cumulants: all zero above first order except the
        three diagonal second-order cumulants rho cs^2. Exact fixpoint at
        rest (the D3Q27 weights are the product form), conserves rho, j
        for any state."""
        rho = m[self._slot[(0, 0, 0)]]
        cs2 = float(self.stencil.cs) ** 2
        diag = rho * cs2
        zero = jnp.zeros_like(rho)
        rows = []
        for idx in _CUM_IDXS:
            if idx == (0, 0, 0) or sum(idx) == 1:
                rows.append(m[self._slot[idx]])
            elif idx in ((2, 0, 0), (0, 2, 0), (0, 0, 2)):
                rows.append(diag)
            else:
                rows.append(zero)
        return jnp.stack(rows)


class D3Q19DHumieres(_MatrixTransform):
    """d'Humieres et al. (2002) Gram-Schmidt basis for D3Q19: density,
    energy, energy square, momenta with their heat fluxes, the five
    second-order stress modes with their higher-order partners, and the
    three antisymmetric third-order modes.

    The reference carries this transform only as a commented-out draft
    (``/root/reference/lettuce/util/moments.py:276-366``); here the
    matrix is generated from the basis polynomials like every other
    transform. Equilibrium moments are the EXACT moment-space image of
    the quadratic equilibrium (no truncated closed form), so equal
    relaxation rates reduce the MRT collision to BGK identically.
    """

    names = ["rho", "e", "eps", "jx", "qx", "jy", "qy", "jz", "qz",
             "pxx3", "pixx3", "pww", "piww", "pxy", "pyz", "pxz",
             "mx", "my", "mz"]
    supported_stencils = [D3Q19]

    @staticmethod
    def _build_matrix(e):
        ex, ey, ez = e[:, 0], e[:, 1], e[:, 2]
        s = ex ** 2 + ey ** 2 + ez ** 2
        return np.stack([
            np.ones_like(ex),
            19 * s - 30,
            (21 * s ** 2 - 53 * s + 24) / 2,
            ex,
            (5 * s - 9) * ex,
            ey,
            (5 * s - 9) * ey,
            ez,
            (5 * s - 9) * ez,
            3 * ex ** 2 - s,
            (3 * s - 5) * (3 * ex ** 2 - s),
            ey ** 2 - ez ** 2,
            (3 * s - 5) * (ey ** 2 - ez ** 2),
            ex * ey,
            ey * ez,
            ex * ez,
            (ey ** 2 - ez ** 2) * ex,
            (ez ** 2 - ex ** 2) * ey,
            (ex ** 2 - ey ** 2) * ez,
        ])

    def equilibrium(self, m, flow: "Flow"):
        # exact image of feq under M — XLA fuses the roundtrip, so unlike
        # the reference's torch path there is nothing inefficient to warn
        # about, and MRT(all taus equal) == BGK holds to roundoff
        f = self.inverse_transform(m)
        feq = flow.equilibrium(flow, flow.rho(f), flow.u(f))
        return self.transform(feq)
