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
