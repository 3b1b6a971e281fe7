"""Multi-chip spatial domain decomposition.

Shards the grid over all available devices (works with real multi-chip
slices and with virtual CPU meshes via jax_num_cpu_devices); streaming halo
exchange rides ICI, and the fused Pallas kernel runs per shard.
"""

import jax
import jax.numpy as jnp
import numpy as np

import lettuce_tpu as lt

n = len(jax.devices())
print(f"devices: {n}")

context = lt.Context(dtype=jnp.float32)
flow = lt.TaylorGreenVortex(context, [64 * n, 128, 128],
                            reynolds_number=1600, mach_number=0.05,
                            stencil=lt.D3Q19(), initialize_fneq=False)
collision = lt.BGKCollision(tau=flow.units.relaxation_parameter_lu)

decomp = lt.DomainDecomposition(mesh_shape=(n,), grid_axes=(0,))
simulation = lt.Simulation(flow, collision, [], decomposition=decomp)

mlups = simulation(500)
print(f"{mlups:.0f} MLUPS across {n} device(s); "
      f"mass = {float(flow.rho().sum()):.1f} "
      f"(expect {np.prod(flow.resolution)})")
