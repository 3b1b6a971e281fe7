"""TGV2D grid-convergence order — the reference's CI acceptance gate
(``lettuce convergence``, ``/root/reference/lettuce/cli.py:129-180``):
under diffusive scaling the velocity error converges at order 2 and the
pressure at order 1, measured as the mean of per-step errors at interval=1
and gated on the final refinement factor (u in [1.9, 2.1], p in [0.9, 1.1]).
"""

import jax.numpy as jnp
import pytest

import lettuce_tpu as lt


def _mean_errors(context, resolution):
    mach = 8 / resolution  # diffusive scaling, as the reference CLI
    flow = lt.TaylorGreenVortex(context, [resolution] * 2,
                                reynolds_number=10000, mach_number=mach,
                                stencil=lt.D2Q9())
    simulation = lt.Simulation(
        flow, lt.BGKCollision(tau=flow.units.relaxation_parameter_lu), [])
    return lt.mean_analytic_error(simulation, 10 * resolution)


def _final_refinement_orders(context, resolutions):
    errors = [_mean_errors(context, r) for r in resolutions]
    order_u = errors[-2][0] / errors[-1][0] / 2
    order_p = errors[-2][1] / errors[-1][1] / 2
    return order_u, order_p


def test_tgv2d_convergence_order():
    """Reference gate tolerances at resolutions up to 2^6 (CI-sized)."""
    context = lt.Context(dtype=jnp.float64)
    order_u, order_p = _final_refinement_orders(context, (16, 32, 64))
    assert 1.9 < order_u < 2.1, f"velocity order {order_u}"
    assert 0.9 < order_p < 1.1, f"pressure order {order_p}"


@pytest.mark.slow
def test_tgv2d_convergence_order_full():
    """The full CLI gate ladder (2^4..2^8) at the reference tolerances."""
    context = lt.Context(dtype=jnp.float64)
    order_u, order_p = _final_refinement_orders(
        context, (16, 32, 64, 128, 256))
    assert 1.9 < order_u < 2.1, f"velocity order {order_u}"
    assert 0.9 < order_p < 1.1, f"pressure order {order_p}"
