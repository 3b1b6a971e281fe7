"""Multi-chip spatial domain decomposition.

Shards the grid over all available devices (works with real multi-chip
slices and with virtual CPU meshes via jax_num_cpu_devices); streaming halo
exchange rides ICI, and the fused Pallas kernel runs per shard.
"""

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from any cwd without installing

import lettuce_tpu as lt

n = len(jax.devices())
print(f"devices: {n}")

# virtual CPU meshes (single host core) just demonstrate the path;
# real accelerators run the production size
on_accel = jax.devices()[0].platform in ("tpu", "gpu")
size_x, size_yz = (64 * n, 128) if on_accel else (4 * n, 16)
steps = 500 if on_accel else 20

context = lt.Context(dtype=jnp.float32)
flow = lt.TaylorGreenVortex(context, [size_x, size_yz, 128],
                            reynolds_number=1600, mach_number=0.05,
                            stencil=lt.D3Q19(), initialize_fneq=False)
collision = lt.BGKCollision(tau=flow.units.relaxation_parameter_lu)

decomp = lt.DomainDecomposition(mesh_shape=(n,), grid_axes=(0,))
simulation = lt.Simulation(flow, collision, [], decomposition=decomp)

simulation(8)  # compile
mlups = simulation(steps)
print(f"{mlups:.0f} MLUPS across {n} device(s); "
      f"mass = {float(flow.rho().sum()):.1f} "
      f"(expect {np.prod(flow.resolution)})")

# a 2D (x, y) device mesh also runs the fused kernel per shard
# (y-halo + x-halo exchange; corners ride the second exchange)
if n % 2 == 0:
    res2 = [16 * n, 64, 128] if on_accel else [4 * n, 32, 128]
    flow2 = lt.TaylorGreenVortex(context, res2,
                                 reynolds_number=1600, mach_number=0.05,
                                 stencil=lt.D3Q19(), initialize_fneq=False)
    decomp2 = lt.DomainDecomposition(mesh_shape=(n // 2, 2))
    sim2 = lt.Simulation(flow2, lt.BGKCollision(
        tau=flow2.units.relaxation_parameter_lu), [],
        decomposition=decomp2)
    print(f"2D mesh ({n // 2}x2): {sim2(steps):.0f} MLUPS")
