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
