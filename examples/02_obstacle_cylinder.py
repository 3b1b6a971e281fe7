"""Flow around a cylinder with VTK output (mirrors the reference's
Obstacle example / docstring)."""

import jax.numpy as jnp
import numpy as np

import lettuce_tpu as lt

context = lt.Context(dtype=jnp.float32)
flow = lt.Obstacle(context, resolution=[200, 100], reynolds_number=100,
                   mach_number=0.1, domain_length_x=10.0)
x, y = flow.grid
flow.mask = np.asarray((x - 2.5) ** 2 + (y - 2.5) ** 2 < 0.5 ** 2)
flow.initialize()

collision = lt.BGKCollision(tau=flow.units.relaxation_parameter_lu)
simulation = lt.Simulation(flow, collision,
                           [lt.VTKReporter(interval=500,
                                           filename_base="./data/cylinder")])
mlups = simulation(num_steps=2000)
print(f"Performance: {mlups:.1f} MLUPS")
u = np.asarray(flow.u_pu)
print("max |u|:", float(np.abs(u).max()))
