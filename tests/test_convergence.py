"""TGV2D grid-convergence order — the reference's CI acceptance gate
(``lettuce convergence``, cli.py:128-180): under diffusive scaling the
velocity error converges at order ~2 and pressure at order ~1."""

import jax.numpy as jnp
import numpy as np
import pytest

import lettuce_tpu as lt


def _run_tgv_error(context, resolution):
    mach = 8 / resolution  # diffusive scaling, as the reference CLI
    flow = lt.TaylorGreenVortex(context, resolution, reynolds_number=10000,
                                mach_number=mach, stencil=lt.D2Q9(),
                                initialize_fneq=False)
    out = []
    reporter = lt.ErrorReporter(flow.analytic_solution,
                                interval=10 * resolution, out=out)
    simulation = lt.Simulation(
        flow, lt.BGKCollision(tau=flow.units.relaxation_parameter_lu),
        [reporter])
    simulation(10 * resolution)
    return np.asarray(out)[-1]  # [err_u, err_p]


@pytest.mark.slow
def test_tgv2d_convergence_order():
    context = lt.Context(dtype=jnp.float64)
    errors = [_run_tgv_error(context, r) for r in (16, 32, 64)]
    errors = np.asarray(errors)
    orders_u = np.log2(errors[:-1, 0] / errors[1:, 0])
    orders_p = np.log2(errors[:-1, 1] / errors[1:, 1])
    order_u = orders_u.mean()
    order_p = orders_p.mean()
    assert abs(order_u - 2.0) < 0.3, f"velocity order {order_u}"
    assert order_p > 0.5, f"pressure order {order_p}"
