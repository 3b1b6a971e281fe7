"""Collision-operator properties (reference tests/collision/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lettuce_tpu as lt
from tests.conftest import TestFlow


def _random_flow(context, stencil, seed=0):
    """Flow with a randomly perturbed near-equilibrium f."""
    flow = TestFlow(context, resolution=[10] * stencil.d, stencil=stencil)
    rng = np.random.RandomState(seed)
    perturbation = rng.uniform(0.9, 1.1, size=flow.f.shape)
    flow.f = flow.f * context.convert_to_tensor(perturbation)
    return flow


def _conserving_collisions(stencil, tau=0.8):
    ops = [lt.BGKCollision(tau), lt.TRTCollision(tau),
           lt.RegularizedCollision(tau)]
    if isinstance(stencil, (lt.D2Q9, lt.D3Q27)):
        ops.append(lt.KBCCollision())
    return ops


def test_collision_conserves_mass_momentum(fix_stencil, fix_context):
    if fix_stencil.d == 1:
        pytest.skip("regularized needs d>=2 shear tensor; BGK covered below")
    flow = _random_flow(fix_context, fix_stencil)
    for op in _conserving_collisions(fix_stencil):
        f_post = op(flow)
        np.testing.assert_allclose(np.asarray(flow.rho(f_post)),
                                   np.asarray(flow.rho()), rtol=1e-8,
                                   err_msg=type(op).__name__)
        np.testing.assert_allclose(np.asarray(flow.j(f_post)),
                                   np.asarray(flow.j()), atol=1e-8,
                                   err_msg=type(op).__name__)


def test_bgk_collision_conserves_1d(fix_context):
    flow = _random_flow(fix_context, lt.D1Q3())
    f_post = lt.BGKCollision(0.7)(flow)
    np.testing.assert_allclose(np.asarray(flow.rho(f_post)),
                               np.asarray(flow.rho()), rtol=1e-8)


def test_bgk_fixpoint_2x(fix_stencil, fix_context):
    """tau = 0.5 BGK applied twice is the identity
    (reference test_collision_fixpoint_2x.py)."""
    flow = _random_flow(fix_context, fix_stencil, seed=1)
    op = lt.BGKCollision(0.5)
    f0 = flow.f
    f2 = op(flow.view(op(flow)))
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f0), atol=1e-10)


def test_equilibrium_is_collision_fixpoint(fix_stencil, fix_context):
    flow = TestFlow(fix_context, resolution=[10] * fix_stencil.d,
                    stencil=fix_stencil)
    op = lt.BGKCollision(0.8)
    np.testing.assert_allclose(np.asarray(op(flow)), np.asarray(flow.f),
                               atol=1e-9)


def test_smagorinsky_conserves(fix_context):
    flow = _random_flow(fix_context, lt.D2Q9())
    op = lt.SmagorinskyCollision(0.8)
    f_post = op(flow)
    np.testing.assert_allclose(np.asarray(flow.rho(f_post)),
                               np.asarray(flow.rho()), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(flow.j(f_post)),
                               np.asarray(flow.j()), atol=1e-8)


def test_kbc_matches_bgk_near_equilibrium(fix_context):
    """With gamma_stab ~ 2 (at equilibrium) KBC reduces to BGK at the same
    tau; check both stay close for a weakly perturbed field."""
    stencil = lt.D2Q9()
    flow = TestFlow(fix_context, resolution=[10, 10], stencil=stencil)
    tau = flow.units.relaxation_parameter_lu
    rng = np.random.RandomState(3)
    flow.f = flow.f * fix_context.convert_to_tensor(
        rng.uniform(0.999, 1.001, size=flow.f.shape))
    f_kbc = lt.KBCCollision()(flow)
    f_bgk = lt.BGKCollision(tau)(flow)
    # KBC == BGK only to first order in the perturbation
    np.testing.assert_allclose(np.asarray(f_kbc), np.asarray(f_bgk),
                               atol=5e-4)


def test_collision_differentiable(fix_context):
    """Gradients flow through collision (autodiff parity with torch)."""
    flow = _random_flow(fix_context, lt.D2Q9())
    op = lt.BGKCollision(0.8)

    def loss(f):
        return jnp.sum(op(flow.view(f)) ** 2)

    g = jax.grad(loss)(flow.f)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_kbc_reusable_across_traces():
    """The KBC moment-matrix cache must be a host constant: a jnp value
    created inside one jit trace is a tracer and leaks into the next trace
    (regression: UnexpectedTracerError on the second traced run)."""
    import jax
    ctx = lt.Context(dtype=jnp.float32)
    flow = lt.TaylorGreenVortex(ctx, [8, 8, 8], 100, 0.05,
                                stencil=lt.D3Q27(), initialize_fneq=False)
    collision = lt.KBCCollision()
    sim = lt.Simulation(flow, collision, [])
    step = sim.make_step_fn()  # public unpadded-shape step
    f1 = jax.jit(step)(flow.f)                       # trace 1
    f2 = jax.jit(lambda f: step(step(f)))(flow.f)    # trace 2
    assert np.all(np.isfinite(np.asarray(f1)))
    assert np.all(np.isfinite(np.asarray(f2)))
