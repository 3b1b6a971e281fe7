"""Moment-transform properties (reference tests/moments/)."""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import lettuce_tpu as lt
from tests.conftest import TestFlow

TRANSFORMS = [(lt.D1Q3Transform, lt.D1Q3),
              (lt.D2Q9Lallemand, lt.D2Q9),
              (lt.D2Q9Dellar, lt.D2Q9),
              (lt.D3Q27Hermite, lt.D3Q27),
              (lt.D3Q19DHumieres, lt.D3Q19)]


@pytest.mark.parametrize("transform_cls,stencil_cls", TRANSFORMS,
                         ids=[t[0].__name__ for t in TRANSFORMS])
def test_inverse_transform_is_identity(transform_cls, stencil_cls,
                                       fix_context):
    stencil = stencil_cls()
    transform = transform_cls(stencil, fix_context)
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.rand(stencil.q, 4, 4)[:, ...])
    roundtrip = transform.inverse_transform(transform.transform(f))
    np.testing.assert_allclose(np.asarray(roundtrip), np.asarray(f),
                               atol=1e-10)


@pytest.mark.parametrize("transform_cls,stencil_cls", TRANSFORMS,
                         ids=[t[0].__name__ for t in TRANSFORMS])
def test_conserved_moments_are_rho_j(transform_cls, stencil_cls,
                                     fix_context):
    """First 1+d moments are density and momentum."""
    stencil = stencil_cls()
    transform = transform_cls(stencil, fix_context)
    rng = np.random.RandomState(1)
    f = jnp.asarray(rng.rand(stencil.q, 5))
    m = np.asarray(transform.transform(f))
    np.testing.assert_allclose(m[transform.names.index("rho")],
                               np.asarray(f).sum(axis=0), atol=1e-12)
    e = np.asarray(stencil.e, dtype=float)
    # momentum rows located by name (d'Humieres interleaves heat fluxes)
    j_names = [n for n in transform.names if n in ("j", "jx", "jy", "jz")]
    assert len(j_names) == stencil.d
    for a, name in enumerate(j_names):
        np.testing.assert_allclose(m[transform.names.index(name)],
                                   e[:, a] @ np.asarray(f), atol=1e-12)


def test_moment_equilibrium_matches_transformed_feq(fix_context):
    """Analytic equilibrium moments == transform of feq
    (reference test_moment_equilibrium_dellar / _lallemand pattern, for the
    Hermite transform where the equilibrium is exact)."""
    stencil = lt.D3Q27()
    flow = TestFlow(fix_context, resolution=[4, 4, 4], stencil=stencil)
    transform = lt.D3Q27Hermite(stencil, fix_context)
    m = transform.transform(flow.f)
    meq_analytic = np.asarray(transform.equilibrium(m, flow))
    feq = flow.equilibrium(flow)
    meq_direct = np.asarray(transform.transform(feq))
    # equilibrium built from uniform rho/u; moments must agree closely
    np.testing.assert_allclose(meq_analytic[:10], meq_direct[:10],
                               rtol=2e-2, atol=1e-4)


def test_mrt_with_unit_relaxation_projects_to_equilibrium(fix_context):
    """With all relaxation times = 1, MRT returns the equilibrium moments."""
    stencil = lt.D2Q9()
    flow = TestFlow(fix_context, resolution=[6, 6], stencil=stencil)
    rng = np.random.RandomState(2)
    flow.f = flow.f * fix_context.convert_to_tensor(
        rng.uniform(0.95, 1.05, size=flow.f.shape))
    transform = lt.D2Q9Lallemand(stencil, fix_context)
    mrt = lt.MRTCollision(transform, [1.0] * stencil.q, fix_context)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        f_post = mrt(flow)
        expected = transform.inverse_transform(
            transform.equilibrium(transform.transform(flow.f), flow))
    np.testing.assert_allclose(np.asarray(f_post), np.asarray(expected),
                               atol=1e-10)


def test_mrt_conserves_mass_momentum(fix_context):
    stencil = lt.D2Q9()
    flow = TestFlow(fix_context, resolution=[6, 6], stencil=stencil)
    rng = np.random.RandomState(3)
    flow.f = flow.f * fix_context.convert_to_tensor(
        rng.uniform(0.95, 1.05, size=flow.f.shape))
    transform = lt.D2Q9Lallemand(stencil, fix_context)
    mrt = lt.MRTCollision(transform, [1.3] * stencil.q, fix_context)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        f_post = mrt(flow)
    np.testing.assert_allclose(np.asarray(flow.rho(f_post)),
                               np.asarray(flow.rho()), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(flow.j(f_post)),
                               np.asarray(flow.j()), atol=1e-10)


def test_moment_tensor():
    e = np.asarray(lt.D2Q9().e)
    multiindex = np.asarray([[0, 0], [1, 0], [0, 1]])
    mt = lt.moment_tensor(e, multiindex)
    np.testing.assert_array_equal(mt[0], np.ones(9))
    np.testing.assert_array_equal(mt[1], e[:, 0])
    np.testing.assert_array_equal(mt[2], e[:, 1])


def test_get_default_moment_transform(fix_context):
    assert isinstance(
        lt.get_default_moment_transform(lt.D1Q3(), fix_context),
        lt.D1Q3Transform)
    assert isinstance(
        lt.get_default_moment_transform(lt.D2Q9(), fix_context),
        lt.D2Q9Lallemand)
    assert isinstance(
        lt.get_default_moment_transform(lt.D3Q19(), fix_context),
        lt.D3Q19DHumieres)  # beyond the reference (its draft is dead code)
    with pytest.raises(lt.LettuceException):
        lt.get_default_moment_transform(lt.D3Q15(), fix_context)


def test_d3q19_dhumieres_equal_taus_is_bgk(fix_context):
    """The d'Humieres equilibrium is the exact moment image of feq, so
    MRT with every relaxation rate = 1/tau reduces to BGK identically."""
    stencil = lt.D3Q19()
    flow = TestFlow(fix_context, resolution=[4, 4, 4], stencil=stencil)
    rng = np.random.RandomState(5)
    flow.f = flow.f * fix_context.convert_to_tensor(
        rng.uniform(0.95, 1.05, size=flow.f.shape))
    tau = 0.8
    transform = lt.D3Q19DHumieres(stencil, fix_context)
    mrt = lt.MRTCollision(transform, [tau] * stencil.q, fix_context)
    bgk = lt.BGKCollision(tau=tau)
    np.testing.assert_allclose(np.asarray(mrt(flow)),
                               np.asarray(bgk(flow)), atol=1e-12)


# ---------------------------------------------------------------------------
# D3Q27 cumulant transform + collision (the component both the reference and
# rounds 1-4 left unfinished — reference moments.py:276-366 is a commented
# draft)
# ---------------------------------------------------------------------------

def _random_flow_q27(fix_context, seed=7):
    stencil = lt.D3Q27()
    flow = TestFlow(fix_context, resolution=[4, 4, 4], stencil=stencil)
    rng = np.random.RandomState(seed)
    flow.f = flow.f * fix_context.convert_to_tensor(
        rng.uniform(0.95, 1.05, size=flow.f.shape))
    return stencil, flow


def test_cumulant_roundtrip_is_identity(fix_context):
    stencil, flow = _random_flow_q27(fix_context)
    tr = lt.D3Q27CumulantTransform(stencil, fix_context)
    roundtrip = tr.inverse_transform(tr.transform(flow.f))
    np.testing.assert_allclose(np.asarray(roundtrip), np.asarray(flow.f),
                               atol=1e-10)


def test_cumulant_conserved_slots_are_rho_j(fix_context):
    stencil, flow = _random_flow_q27(fix_context)
    tr = lt.D3Q27CumulantTransform(stencil, fix_context)
    c = np.asarray(tr.transform(flow.f))
    np.testing.assert_allclose(c[tr.names.index("rho")],
                               np.asarray(flow.rho())[0], atol=1e-12)
    j = np.asarray(flow.j())
    for a, name in enumerate(["jx", "jy", "jz"]):
        np.testing.assert_allclose(c[tr.names.index(name)], j[a],
                                   atol=1e-12)


def test_cumulant_matches_geier_published_relation(fix_context):
    """The derived series must reproduce Geier et al. (2015)'s published
    fourth-order relation C_220 = k220 - (k200 k020 + 2 k110^2)/rho —
    checked numerically against hand-computed central moments."""
    stencil, flow = _random_flow_q27(fix_context)
    tr = lt.D3Q27CumulantTransform(stencil, fix_context)
    c = np.asarray(tr.transform(flow.f))
    f = np.asarray(flow.f, dtype=np.float64)
    e = np.asarray(stencil.e, dtype=np.float64)
    rho = f.sum(axis=0)
    u = np.einsum("qa,q...->a...", e, f) / rho

    def kappa(a, b, cc):
        return np.einsum("q...,q...->...",
                         (e[:, 0, None, None, None] - u[0]) ** a
                         * (e[:, 1, None, None, None] - u[1]) ** b
                         * (e[:, 2, None, None, None] - u[2]) ** cc, f)

    c220 = kappa(2, 2, 0) - (kappa(2, 0, 0) * kappa(0, 2, 0)
                             + 2 * kappa(1, 1, 0) ** 2) / rho
    np.testing.assert_allclose(c[tr.names.index("C_220")], c220,
                               atol=1e-10)
    c211 = kappa(2, 1, 1) - (kappa(2, 0, 0) * kappa(0, 1, 1)
                             + 2 * kappa(1, 1, 0) * kappa(1, 0, 1)) / rho
    np.testing.assert_allclose(c[tr.names.index("C_211")], c211,
                               atol=1e-10)


def test_cumulant_equilibrium_fixpoint_at_rest(fix_context):
    """feq(rho, u=0) = w rho has EXACTLY the Maxwellian cumulants (the
    D3Q27 weights are the 1D product form), so it is an exact fixpoint of
    the cumulant collision."""
    stencil = lt.D3Q27()
    flow = TestFlow(fix_context, resolution=[4, 4, 4], stencil=stencil)
    w = np.asarray(stencil.w)
    flow.f = fix_context.convert_to_tensor(
        1.2 * w[:, None, None, None] * np.ones((27, 4, 4, 4)))
    col = lt.CumulantCollision(stencil, tau=0.8, context=fix_context)
    np.testing.assert_allclose(np.asarray(col(flow)), np.asarray(flow.f),
                               atol=1e-12)


def test_cumulant_collision_conserves_mass_momentum(fix_context):
    stencil, flow = _random_flow_q27(fix_context)
    col = lt.CumulantCollision(stencil, tau=0.9, context=fix_context)
    f_post = col(flow)
    np.testing.assert_allclose(np.asarray(flow.rho(f_post)),
                               np.asarray(flow.rho()), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(flow.j(f_post)),
                               np.asarray(flow.j()), atol=1e-10)


def test_cumulant_second_order_relaxation_matches_bgk_stress(fix_context):
    """The six second-order cumulants relax at 1/tau exactly like BGK's
    deviatoric stress: after one collision the post-collision
    second-order central moments must agree with BGK's to the order-u^3
    difference between cumulant and raw-moment relaxation."""
    stencil, flow = _random_flow_q27(fix_context, seed=11)
    tau = 0.8
    cum = lt.CumulantCollision(stencil, tau=tau, context=fix_context)
    f_c = np.asarray(cum(flow), dtype=np.float64)
    e = np.asarray(stencil.e, dtype=np.float64)
    f0 = np.asarray(flow.f, dtype=np.float64)
    rho = f0.sum(axis=0)
    u = np.einsum("qa,q...->a...", e, f0) / rho

    def kappa(f, a, b, cc):
        return np.einsum("q...,q...->...",
                         (e[:, 0, None, None, None] - u[0]) ** a
                         * (e[:, 1, None, None, None] - u[1]) ** b
                         * (e[:, 2, None, None, None] - u[2]) ** cc, f)

    # cumulant = central moment at order 2; relaxed toward rho cs^2 delta
    k110_pre = kappa(f0, 1, 1, 0)
    k110_post_expected = k110_pre - (1.0 / tau) * k110_pre
    np.testing.assert_allclose(kappa(f_c, 1, 1, 0), k110_post_expected,
                               atol=1e-10)
    k200_pre = kappa(f0, 2, 0, 0)
    k200_post_expected = k200_pre - (1.0 / tau) * (k200_pre - rho / 3.0)
    np.testing.assert_allclose(kappa(f_c, 2, 0, 0), k200_post_expected,
                               atol=1e-10)
