"""Pressure-driven flow through a random porous medium; measures the
permeability via Darcy's law.

Mirrors the reference's advanced PorousMedium notebook
(``examples/advanced_flows/PorousMedium.ipynb``): a field of random
solid circles inside an Obstacle flow, driven by a density (pressure)
difference across the periodic x axis with ``PeriodicPressureBC``, run
until the mean velocity converges, then
``k = nu * <u_x> / (delta_p / L)``.
"""

import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from any cwd without installing

import lettuce_tpu as lt

# -------------------- geometry --------------------
nx, ny = 256, 256
n_buffer = 10         # obstacle-free layers at the driven faces
n_circles = 40
delta_rho_lu = 0.002  # imposed density difference (pressure / cs^2)

context = lt.Context(dtype=jnp.float32)
flow = lt.Obstacle(context, resolution=[nx, ny], reynolds_number=1,
                   mach_number=0.05, domain_length_x=nx)

rng = np.random.default_rng(234269)
x, y = (np.asarray(g) for g in flow.grid)
mask = np.zeros((nx, ny), dtype=bool)
for _ in range(n_circles):
    x0, y0 = rng.random(2) * nx
    r = (0.02 + 0.02 * rng.random()) * nx
    mask |= (x - x0) ** 2 + (y - y0) ** 2 < r ** 2
mask[:n_buffer] = mask[-n_buffer:] = False
porosity = 1.0 - mask.mean()
print(f"porosity: {100 * porosity:.1f} %")

# -------------------- boundaries: solid + pressure driving ------------
collision = lt.BGKCollision(tau=flow.units.relaxation_parameter_lu)


class PorousMedium2D(lt.Obstacle):
    """Obstacle flow driven by a pressure difference over the periodic
    x axis instead of in/outflow boundaries."""

    @property
    def boundaries(self):
        return [
            lt.PeriodicPressureBC(self, delta_rho_lu, collision,
                                  exclude_mask=self.mask),
            lt.BounceBackBoundary(self.mask),
        ]


flow.__class__ = PorousMedium2D
flow.mask = mask
flow.initialize()

simulation = lt.Simulation(flow, collision, [])

# -------------------- run to steady state --------------------
u_avg_prev, it = np.inf, 0
while it < 200_000:
    simulation(500)
    it += 500
    u_avg = float(jnp.mean(flow.u()[0]))
    change = abs(u_avg - u_avg_prev) / max(abs(u_avg), 1e-30)
    print(f"it {it:6d}  <u_x> = {u_avg:.3e}  rel change {100 * change:.2f} %")
    if change < 1e-3:
        break
    u_avg_prev = u_avg

# -------------------- Darcy permeability --------------------
nu_lu = flow.units.viscosity_lu
grad_p = delta_rho_lu * float(flow.stencil.cs) ** 2 / nx
k = nu_lu * u_avg / grad_p
print(f"permeability k = {k:.2f} [lu^2]  (porosity {100 * porosity:.1f} %)")
