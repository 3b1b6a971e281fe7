"""Taylor-Green vortex with energy/enstrophy reporting and error vs the
analytic solution (mirrors examples/01a_first_example_TGV.ipynb)."""

import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from any cwd without installing

import lettuce_tpu as lt

context = lt.Context(dtype=jnp.float32)
flow = lt.TaylorGreenVortex(context, resolution=128, reynolds_number=1600,
                            mach_number=0.05, stencil=lt.D2Q9())
collision = lt.BGKCollision(tau=flow.units.relaxation_parameter_lu)

energy_log = []
reporters = [
    lt.ObservableReporter(lt.IncompressibleKineticEnergy(flow),
                          interval=100, out=energy_log),
    lt.ObservableReporter(lt.Enstrophy(flow), interval=100),
    lt.ErrorReporter(flow.analytic_solution, interval=500),
]
simulation = lt.Simulation(flow, collision, reporters)
mlups = simulation(num_steps=2000)
print(f"Performance: {mlups:.1f} MLUPS")
print(f"Energy decay: {energy_log[0][2]:.6f} -> {energy_log[-1][2]:.6f}")
