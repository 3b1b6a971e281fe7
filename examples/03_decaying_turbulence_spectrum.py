"""2D decaying turbulence with energy-spectrum reporting (mirrors
examples/simple_flows/DecayingTurbulence.ipynb)."""

import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from any cwd without installing

import lettuce_tpu as lt

context = lt.Context(dtype=jnp.float32)
flow = lt.DecayingTurbulence(context, resolution=[256, 256],
                             reynolds_number=2000, mach_number=0.05,
                             k0=20, randseed=0)
collision = lt.BGKCollision(tau=flow.units.relaxation_parameter_lu)
simulation = lt.Simulation(flow, collision, [])

spectrum_op = lt.EnergySpectrum(flow)
e0 = np.asarray(spectrum_op(flow.f))
mlups = simulation(num_steps=2000)
e1 = np.asarray(spectrum_op(flow.f))
print(f"Performance: {mlups:.1f} MLUPS")
print(f"spectrum peak moved: k={e0.argmax()} -> k={e1.argmax()}, "
      f"total energy {e0.sum():.4f} -> {e1.sum():.4f}")
