"""Direct head-to-head against the original torch reference (when it is
available on disk): identical TGV2D f64 runs must agree to near machine
precision — the executable form of the north-star requirement
"observables <= 1e-6 vs reference (f64)".

Skipped automatically when the reference checkout or torch is absent.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_PATH = os.environ.get("LETTUCE_REFERENCE", "/root/reference")


def _load_reference():
    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference checkout not available")
    # stub pyevtk (not installed; only the VTK reporter needs it)
    import types
    if "pyevtk" not in sys.modules:
        pyevtk = types.ModuleType("pyevtk")
        hl = types.ModuleType("pyevtk.hl")
        hl.gridToVTK = lambda *a, **k: None
        pyevtk.hl = hl
        sys.modules["pyevtk"] = pyevtk
        sys.modules["pyevtk.hl"] = hl
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import torch  # noqa: F401
        import lettuce as ltr
        return ltr
    except Exception as ex:  # pragma: no cover
        pytest.skip(f"reference import failed: {ex}")
    finally:
        sys.path.remove(REFERENCE_PATH)


@pytest.mark.parametrize("name", ["kbc", "trt", "regularized",
                                  "smagorinsky"])
def test_collision_matrix_f64_matches_reference(name):
    """Every shared collision operator, run head-to-head against the
    actual torch reference on an identical TGV2D f64 rollout. (The
    reference's MRT transforms still call removed Lattice methods — its
    own test suite skips them — so MRT parity is covered by our
    fixpoint/conservation tests instead.)

    KBC gets a deterministic O(1e-3) non-equilibrium perturbation on the
    initial f: on an equilibrium-initialised flow its stabiliser gamma is
    0/0-degenerate (sum_h ~ 1e-31 roundoff), so the reference's own
    output depends on torch's reduction order and no cross-framework
    bitwise target exists. Away from that degenerate set, 20 steps agree
    to ~1e-14 (reference ``kbc_collision.py:149-158``)."""
    ltr = _load_reference()
    import torch

    import jax.numpy as jnp
    import lettuce_tpu as lt

    def make_collision(mod, tau):
        if name == "kbc":
            return mod.KBCCollision(tau=tau)
        if name == "trt":
            return mod.TRTCollision(tau, tau_minus=1.1)
        if name == "regularized":
            return mod.RegularizedCollision(tau)
        return mod.SmagorinskyCollision(tau)

    rctx = ltr.Context(device=torch.device("cpu"), dtype=torch.float64,
                       use_native=False)
    rflow = ltr.TaylorGreenVortex(rctx, 32, 400, 0.05, stencil=ltr.D2Q9())

    f0 = rflow.f.numpy()
    if name == "kbc":
        q, nx, ny = f0.shape
        x = np.arange(nx)[None, :, None]
        y = np.arange(ny)[None, None, :]
        iq = np.arange(q)[:, None, None]
        f0 = f0 * (1 + 1e-3 * np.sin(2 * np.pi * (3 * x + 5 * y) / nx + iq))
        rflow.f = torch.tensor(f0)

    rsim = ltr.Simulation(
        rflow, make_collision(ltr, rflow.units.relaxation_parameter_lu), [])
    rsim(20)

    ctx = lt.Context(dtype=jnp.float64, use_native=False)
    flow = lt.TaylorGreenVortex(ctx, 32, 400, 0.05, stencil=lt.D2Q9())
    if name == "kbc":
        flow.f = jnp.asarray(f0)
    sim = lt.Simulation(
        flow, make_collision(lt, flow.units.relaxation_parameter_lu), [])
    sim(20)

    np.testing.assert_allclose(np.asarray(flow.f), rflow.f.numpy(),
                               atol=1e-12)


def test_cavity_boundaries_f64_match_reference():
    """Bounce-back walls + moving equilibrium lid: the mask-coded
    boundary composition matches the reference exactly. (Couette cannot
    be compared head-to-head: the reference's CouetteFlow2D sets
    characteristic_velocity_pu = 0, so every unit conversion divides by
    zero and its state is NaN from step one — a documented upstream bug
    that models/couette.py fixes.)"""
    ltr = _load_reference()
    import torch

    import jax.numpy as jnp
    import lettuce_tpu as lt

    rctx = ltr.Context(device=torch.device("cpu"), dtype=torch.float64,
                       use_native=False)
    rflow = ltr.Cavity2D(rctx, 16, reynolds_number=100, mach_number=0.05)
    rsim = ltr.Simulation(
        rflow, ltr.BGKCollision(tau=rflow.units.relaxation_parameter_lu),
        [])
    rsim(30)

    ctx = lt.Context(dtype=jnp.float64, use_native=False)
    flow = lt.Cavity2D(ctx, 16, reynolds_number=100, mach_number=0.05)
    sim = lt.Simulation(
        flow, lt.BGKCollision(tau=flow.units.relaxation_parameter_lu), [])
    sim(30)

    np.testing.assert_allclose(np.asarray(flow.f), rflow.f.numpy(),
                               atol=1e-13)


def test_poiseuille_guo_forcing_f64_matches_reference():
    """Guo-forced body-force channel: u_eq shift + source term match."""
    ltr = _load_reference()
    import torch

    import jax.numpy as jnp
    import lettuce_tpu as lt

    rctx = ltr.Context(device=torch.device("cpu"), dtype=torch.float64,
                       use_native=False)
    rflow = ltr.PoiseuilleFlow2D(rctx, 16, reynolds_number=10,
                                 mach_number=0.05)
    rtau = rflow.units.relaxation_parameter_lu
    rsim = ltr.Simulation(
        rflow, ltr.BGKCollision(
            tau=rtau, force=ltr.Guo(rflow, rtau, rflow.acceleration)), [])
    rsim(30)

    ctx = lt.Context(dtype=jnp.float64, use_native=False)
    flow = lt.PoiseuilleFlow2D(ctx, 16, reynolds_number=10,
                               mach_number=0.05)
    tau = flow.units.relaxation_parameter_lu
    sim = lt.Simulation(
        flow, lt.BGKCollision(
            tau=tau, force=lt.Guo(flow, tau, flow.acceleration)), [])
    sim(30)

    np.testing.assert_allclose(np.asarray(flow.f), rflow.f.numpy(),
                               atol=1e-13)


def test_tgv2d_f64_matches_reference_to_machine_precision():
    ltr = _load_reference()
    import torch

    import jax.numpy as jnp
    import lettuce_tpu as lt

    rctx = ltr.Context(device=torch.device("cpu"), dtype=torch.float64,
                       use_native=False)
    rflow = ltr.TaylorGreenVortex(rctx, 32, 400, 0.05, stencil=ltr.D2Q9())
    rsim = ltr.Simulation(
        rflow, ltr.BGKCollision(tau=rflow.units.relaxation_parameter_lu),
        [])
    rsim(50)

    ctx = lt.Context(dtype=jnp.float64, use_native=False)
    flow = lt.TaylorGreenVortex(ctx, 32, 400, 0.05, stencil=lt.D2Q9())
    sim = lt.Simulation(
        flow, lt.BGKCollision(tau=flow.units.relaxation_parameter_lu), [])
    sim(50)

    np.testing.assert_allclose(np.asarray(flow.f), rflow.f.numpy(),
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(flow.u_pu), rflow.u_pu.numpy(),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(flow.p_pu), rflow.p_pu.numpy(),
                               atol=1e-10)
