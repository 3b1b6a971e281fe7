"""Boundary behaviour (reference tests/boundary/): algebraic checks on twin
flows, mask wiring, outlets."""

import jax.numpy as jnp
import numpy as np
import pytest

import lettuce_tpu as lt
from tests.conftest import TestFlow


def test_bounce_back_is_opposite(fix_stencil, fix_context):
    mask = np.zeros([6] * fix_stencil.d, dtype=bool)
    mask[(0,) * fix_stencil.d] = True
    flow = TestFlow(fix_context, resolution=[6] * fix_stencil.d,
                    stencil=fix_stencil)
    rng = np.random.RandomState(0)
    flow.f = fix_context.convert_to_tensor(rng.rand(*flow.f.shape))
    bb = lt.BounceBackBoundary(mask)
    out = np.asarray(bb(flow))
    np.testing.assert_array_equal(
        out, np.asarray(flow.f)[np.asarray(fix_stencil.opposite)])


def test_equilibrium_bc_pu_algebra(fix_context):
    """The BC field equals the hand-computed equilibrium of the prescribed
    velocity/pressure (reference test_equilibrium_bc_pu.py:37-81)."""
    stencil = lt.D2Q9()
    mask = np.zeros((8, 8), dtype=bool)
    mask[0, :] = True
    flow = TestFlow(fix_context, resolution=[8, 8], stencil=stencil)
    velocity_pu = [0.2, 0.1]
    pressure_pu = 0.01
    bc = lt.EquilibriumBoundaryPU(fix_context, mask, velocity_pu,
                                  pressure_pu)
    out = np.asarray(bc(flow))

    rho = flow.units.convert_pressure_pu_to_density_lu(pressure_pu)
    u = flow.units.convert_velocity_to_lu(jnp.asarray(velocity_pu,
                                                      dtype=flow.f.dtype))
    feq = np.asarray(flow.equilibrium(flow, rho=jnp.asarray(rho), u=u))
    for q in range(9):
        np.testing.assert_allclose(out[q], feq[q], rtol=1e-6)


def test_equilibrium_bc_per_node_velocity(fix_context):
    """Per-node velocity fields broadcast like the reference's native
    broadcast-aware path (cuda_native/ext/_boundary/equilibrium_pu.py)."""
    stencil = lt.D2Q9()
    mask = np.zeros((8, 8), dtype=bool)
    mask[0, :] = True
    flow = TestFlow(fix_context, resolution=[8, 8], stencil=stencil)
    rng = np.random.RandomState(1)
    velocity_pu = rng.rand(2, 8, 8) * 0.1
    bc = lt.EquilibriumBoundaryPU(fix_context, mask, velocity_pu, 0.0)
    out = bc(flow)
    assert out.shape == flow.f.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_mask_wiring(fix_context):
    """no_collision_mask is index-coded by sorted boundary order
    (reference test_bc_masks.py)."""
    stencil = lt.D2Q9()
    m1 = np.zeros((8, 8), dtype=bool)
    m1[0, :] = True
    m2 = np.zeros((8, 8), dtype=bool)
    m2[-1, :] = True
    b1 = lt.BounceBackBoundary(m1)
    b2 = lt.EquilibriumBoundaryPU(fix_context, m2, [0.1, 0.0])
    flow = TestFlow(fix_context, resolution=[8, 8], stencil=stencil,
                    boundaries=[b1, b2])
    sim = lt.Simulation(flow, lt.BGKCollision(0.8), [])
    ncm = np.asarray(sim.no_collision_mask)
    codes = {str(type(b).__name__): i
             for i, b in enumerate(sim.boundaries[1:], start=1)}
    assert set(np.unique(ncm)) <= {0, 1, 2}
    assert np.all(ncm[0, :] == codes['BounceBackBoundary'])
    assert np.all(ncm[-1, :] == codes['EquilibriumBoundaryPU'])
    assert np.all(ncm[3, :] == 0)


def test_anti_bounce_back_outlet_masks(fix_context):
    flow = lt.Obstacle(fix_context, [16, 8], reynolds_number=50,
                       mach_number=0.05, domain_length_x=1.6)
    outlet = [b for b in flow.boundaries
              if isinstance(b, lt.AntiBounceBackOutlet)][0]
    nsm = np.asarray(outlet.make_no_streaming_mask(
        [flow.stencil.q, *flow.resolution], fix_context))
    # only the face x = -1 is masked, only for incoming (opposite) dirs
    assert nsm[:, :-1, :].sum() == 0
    opp = np.asarray(flow.stencil.opposite)[outlet.velocities]
    face_sum = nsm[:, -1, :].sum()
    assert face_sum == len(opp) * flow.resolution[1]


def test_equilibrium_outlet_p_sets_face(fix_context):
    flow = lt.Obstacle(fix_context, [16, 8], reynolds_number=50,
                       mach_number=0.05, domain_length_x=1.6)
    outlet = lt.EquilibriumOutletP([1, 0], flow, rho_outlet=1.0)
    # the boundary returns a full replacement field; the Simulation composes
    # it with where(no_collision_mask == i, ...), so only the face is used
    mask = np.asarray(outlet.make_no_collision_mask(
        list(flow.resolution), flow.context), dtype=bool)
    assert mask[-1, :].all() and not mask[:-1, :].any()
    out = np.asarray(outlet(flow))
    composed = np.where(mask, out, np.asarray(flow.f))
    np.testing.assert_array_equal(composed[:, :-1, :],
                                  np.asarray(flow.f)[:, :-1, :])
    assert np.all(np.isfinite(composed[:, -1, :]))
    # face value is feq(rho_outlet, u_neighbor)
    u_nbr = np.asarray(flow.u())[:, -2, :]
    feq = np.asarray(flow.equilibrium(
        flow, jnp.ones((1, 8), dtype=flow.f.dtype),
        jnp.asarray(u_nbr)))
    np.testing.assert_allclose(composed[:, -1, :], feq, rtol=1e-6)


def test_couette_converges_to_linear_profile(fix_context):
    """Moving-wall + bounce-back produce the linear Couette profile."""
    flow = lt.CouetteFlow2D(fix_context, 16, reynolds_number=5,
                            mach_number=0.05)
    sim = lt.Simulation(
        flow, lt.BGKCollision(flow.units.relaxation_parameter_lu), [])
    sim(2000)
    u = np.asarray(flow.u_pu)[0]  # [x, y]
    profile = u.mean(axis=0)
    # skip wall nodes; profile should increase monotonically towards lid
    interior = profile[1:-1]
    assert np.all(np.diff(interior) > -1e-6)
    assert profile[-2] > 0.5 * profile[-1] > 0.0


def test_sponge_outlet_damps_startup_acoustics(fix_context):
    """SpongeOutlet (new capability, no reference counterpart): an
    impulsively-started uniform flow fires a pressure transient at the
    outlet; with the sponge layer the density overshoot decays markedly
    faster than with the bare anti-bounce-back outlet, and both ends stay
    finite."""
    def run(outlet_cls, **kw):
        class FlowWithOutlet(lt.Obstacle):
            @property
            def boundaries(self):
                inlet, _, bb = lt.Obstacle.boundaries.fget(self)
                return [inlet, outlet_cls([1, 0], self, **kw), bb]

        flow = FlowWithOutlet(fix_context, [48, 16], reynolds_number=80,
                              mach_number=0.1, domain_length_x=4.8)
        sim = lt.Simulation(flow, lt.BGKCollision(
            flow.units.relaxation_parameter_lu), [])
        peaks = []
        for _ in range(6):
            sim(20)
            rho = np.asarray(flow.rho())
            peaks.append(float(np.abs(rho - 1.0).max()))
        return peaks

    peaks_abb = run(lt.AntiBounceBackOutlet)
    peaks_sponge = run(lt.SpongeOutlet, depth=8, strength=0.3)
    assert np.all(np.isfinite(peaks_sponge))
    # after the transient reaches the outlet, the sponge run is quieter
    assert peaks_sponge[-1] < peaks_abb[-1]


def test_periodic_pressure_bc_drives_poiseuille(fix_context):
    """A pressure difference over the periodic axis drives the same
    parabolic channel profile as the equivalent body force: the
    imposed gradient cs^2 * drho / nx must equal rho * a."""
    flow = lt.PoiseuilleFlow2D(fix_context, resolution=16,
                               reynolds_number=1, mach_number=0.02,
                               initialize_with_zeros=True)
    a_lu = float(flow.units.convert_acceleration_to_lu(
        flow.acceleration)[0])
    nx = flow.resolution[0]
    cs = float(flow.stencil.cs)
    delta_rho = a_lu * nx / cs ** 2

    plates = (np.asarray(flow.grid[1]) <= 0) | (np.asarray(flow.grid[1]) >= 1)
    collision = lt.BGKCollision(tau=flow.units.relaxation_parameter_lu)

    class PressureDriven(type(flow)):
        pass

    flow.__class__ = PressureDriven
    base_boundaries = lt.PoiseuilleFlow2D.boundaries.fget(flow)
    ppbc = lt.PeriodicPressureBC(flow, delta_rho, collision,
                                 exclude_mask=plates)
    PressureDriven.boundaries = property(
        lambda self: base_boundaries + [ppbc])

    simulation = lt.Simulation(flow, collision, [])
    simulation(800)

    u_sim = np.asarray(flow.units.convert_velocity_to_pu(flow.u()))
    _, u_ref = flow.analytic_solution()
    u_ref = np.asarray(u_ref)
    # compare away from the driven faces and the walls
    mid = slice(4, -4)
    err = (np.abs(u_sim[0][mid, 1:-1] - u_ref[0][mid, 1:-1]).max()
           / np.abs(u_ref[0]).max())
    assert err < 0.08, f"profile error {err}"
    assert np.all(np.isfinite(u_sim))


def test_periodic_pressure_bc_3d_drives_flow(fix_context):
    """The pressure-difference boundary is stencil-generic: a D3Q19
    periodic box develops a mean flow along the driven axis only."""
    flow = lt.TaylorGreenVortex(fix_context, [8, 8, 8], 100, 0.05,
                                stencil=lt.D3Q19(), initialize_fneq=False)
    collision = lt.BGKCollision(tau=flow.units.relaxation_parameter_lu)

    class Driven(type(flow)):
        pass

    flow.__class__ = Driven
    flow.f = flow.equilibrium(flow, rho=jnp.ones((1, 8, 8, 8)),
                              u=jnp.zeros((3, 8, 8, 8)))
    ppbc = lt.PeriodicPressureBC(flow, 0.01, collision, axis=0)
    Driven.boundaries = property(lambda self: [ppbc])
    simulation = lt.Simulation(flow, collision, [])
    simulation(50)
    u = np.asarray(flow.u())
    assert float(u[0].mean()) > 1e-5          # driven along +x
    assert abs(float(u[1].mean())) < 1e-10    # transverse means vanish
    assert abs(float(u[2].mean())) < 1e-10
    assert np.all(np.isfinite(u))
