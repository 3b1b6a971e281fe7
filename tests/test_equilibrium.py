"""Equilibrium properties (reference tests/test_equilibrium.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import lettuce_tpu as lt
from tests.conftest import TestFlow


@pytest.mark.parametrize("eq_cls", [lt.QuadraticEquilibrium,
                                    lt.QuadraticEquilibriumLessMemory])
def test_equilibrium_conserves_mass(fix_stencil, fix_context, eq_cls):
    flow = TestFlow(fix_context, resolution=[8] * fix_stencil.d,
                    stencil=fix_stencil, equilibrium=eq_cls())
    feq = flow.equilibrium(flow)
    np.testing.assert_allclose(np.asarray(flow.rho(feq)),
                               np.asarray(flow.rho()), rtol=1e-6)


@pytest.mark.parametrize("eq_cls", [lt.QuadraticEquilibrium,
                                    lt.QuadraticEquilibriumLessMemory])
def test_equilibrium_conserves_momentum(fix_stencil, fix_context, eq_cls):
    flow = TestFlow(fix_context, resolution=[8] * fix_stencil.d,
                    stencil=fix_stencil, equilibrium=eq_cls())
    feq = flow.equilibrium(flow)
    np.testing.assert_allclose(np.asarray(flow.j(feq)),
                               np.asarray(flow.j()), atol=1e-6)


def test_incompressible_equilibrium_conserves_mass(fix_stencil, fix_context):
    flow = TestFlow(fix_context, resolution=[8] * fix_stencil.d,
                    stencil=fix_stencil,
                    equilibrium=lt.IncompressibleQuadraticEquilibrium())
    feq = flow.equilibrium(flow)
    np.testing.assert_allclose(np.asarray(flow.rho(feq)),
                               np.asarray(flow.rho()), rtol=1e-6)


def test_equilibrium_vector_inputs(fix_context):
    """Scalar rho + [d] velocity produce a [q] equilibrium (boundary use)."""
    flow = TestFlow(fix_context, resolution=[8, 8], stencil=lt.D2Q9())
    feq = flow.equilibrium(flow, rho=jnp.asarray(1.0),
                           u=jnp.asarray([0.1, 0.0]))
    assert feq.shape == (9,)
    assert np.isclose(np.sum(np.asarray(feq)), 1.0)
