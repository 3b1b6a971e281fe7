"""Flow around a cylinder with VTK output (mirrors the reference's
Obstacle example / docstring).

Two deliberate upgrades over the reference configuration:
  * the reference's bare AntiBounceBackOutlet amplifies the startup
    acoustic wave on impulsively started cylinders and diverges (NaN by
    ~step 1500 — reproduced with the torch reference itself); the
    absorbing SpongeOutlet damps it instead;
  * a 128-multiple minor axis lets the whole flow (inlet + outlet +
    bounce-back mask) ride the fused Pallas kernel via the hybrid plane
    fix-up.
"""

import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from any cwd without installing

import lettuce_tpu as lt

context = lt.Context(dtype=jnp.float32)
flow = lt.Obstacle(context, resolution=[256, 128], reynolds_number=100,
                   mach_number=0.1, domain_length_x=10.0)


class ObstacleSpongeOutlet(lt.Obstacle):
    """Obstacle flow with the absorbing outlet."""

    @property
    def boundaries(self):
        inlet, _, bb = lt.Obstacle.boundaries.fget(self)
        return [inlet, lt.SpongeOutlet([1, 0], self, depth=8), bb]


flow.__class__ = ObstacleSpongeOutlet
x, y = flow.grid
flow.mask = np.asarray((x - 2.5) ** 2 + (y - 2.5) ** 2 < 0.5 ** 2)
flow.initialize()

collision = lt.BGKCollision(tau=flow.units.relaxation_parameter_lu)
simulation = lt.Simulation(flow, collision,
                           [lt.VTKReporter(interval=500,
                                           filename_base="./data/cylinder"),
                            lt.NaNGuard(flow, interval=500)])
mlups = simulation(num_steps=2000)
print(f"Performance: {mlups:.1f} MLUPS ({simulation.step_path} path)")
u = np.asarray(flow.u_pu)
print("max |u|:", float(np.abs(u).max()))
