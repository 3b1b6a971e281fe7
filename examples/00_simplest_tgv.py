"""Minimal Taylor-Green vortex run (mirrors the reference's
examples/00_simplest_TGV.py)."""

import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from any cwd without installing

import lettuce_tpu as lt

context = lt.Context(dtype=jnp.float32)
flow = lt.TaylorGreenVortex(context, resolution=64, reynolds_number=100,
                            mach_number=0.05, stencil=lt.D2Q9())
collision = lt.BGKCollision(tau=flow.units.relaxation_parameter_lu)
simulation = lt.Simulation(flow, collision, [])

mlups = simulation(num_steps=1000)
print(f"Performance: {mlups:.1f} MLUPS")
