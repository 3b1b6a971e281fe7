"""Forcing schemes drive the analytic Poiseuille profile
(reference tests/collision/test_force.py) and related utilities."""

import jax.numpy as jnp
import numpy as np
import pytest

import lettuce_tpu as lt


@pytest.mark.parametrize("force_cls", [lt.Guo, lt.ShanChen])
def test_force_poiseuille_profile(force_cls, fix_context):
    context = fix_context
    flow = lt.PoiseuilleFlow2D(context, resolution=16, reynolds_number=1,
                               mach_number=0.02,
                               initialize_with_zeros=True)
    acc_lu = flow.units.convert_acceleration_to_lu(flow.acceleration)
    tau = flow.units.relaxation_parameter_lu
    force = force_cls(flow, tau=tau, acceleration=acc_lu)
    collision = lt.BGKCollision(tau=tau, force=force)
    simulation = lt.Simulation(flow, collision, [])
    simulation(500)

    # velocity with forcing correction
    u_sim = flow.units.convert_velocity_to_pu(
        flow.u(acceleration=acc_lu))
    u_sim = np.asarray(u_sim)[:, 1:-1, 1:-1]
    _, u_ref = flow.analytic_solution()
    u_ref = np.asarray(u_ref)[:, 1:-1, 1:-1]
    err = np.abs(u_sim - u_ref).max() / np.abs(u_ref).max()
    assert err < 0.06, f"profile error {err}"


def test_guo_source_term_shape(fix_context):
    flow = lt.PoiseuilleFlow2D(fix_context, resolution=8,
                               reynolds_number=10, mach_number=0.05)
    acc_lu = flow.units.convert_acceleration_to_lu(flow.acceleration)
    force = lt.Guo(flow, tau=0.8, acceleration=acc_lu)
    si = force.source_term(flow.u())
    assert si.shape == flow.f.shape
    # Guo source conserves mass: sum_q S_q = 0
    np.testing.assert_allclose(np.asarray(jnp.sum(si, axis=0)), 0,
                               atol=1e-12)


def test_grid_fine_to_coarse(fix_context):
    """Restriction halves the resolution and preserves the macroscopic
    fields (reference tests/test_grid_fine_to_coarse.py pattern)."""
    flow_f = lt.TaylorGreenVortex(fix_context, 32, 100, 0.05,
                                  stencil=lt.D2Q9(), initialize_fneq=False)
    flow_c = lt.TaylorGreenVortex(fix_context, 16, 100, 0.05,
                                  stencil=lt.D2Q9(), initialize_fneq=False)
    tau_f = flow_f.units.relaxation_parameter_lu
    tau_c = flow_c.units.relaxation_parameter_lu
    f_coarse = lt.grid_fine_to_coarse(flow_f, flow_f.f, tau_f, tau_c)
    assert f_coarse.shape == (9, 16, 16)
    rho_c = np.asarray(flow_c.rho(f_coarse))
    rho_ref = np.asarray(flow_f.rho())[:, ::2, ::2]
    np.testing.assert_allclose(rho_c, rho_ref, rtol=1e-5)
