"""Focused micro-bench: regularized D3Q27 kernel path only.

Usage: LETTUCE_BLOCK_TARGET=8,16 LETTUCE_NSUB=2 python benchmarks/micro_reg.py [res]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import lettuce_tpu as lt

res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 476

ctx = lt.Context(dtype=jnp.float32, use_native=True)
flow = lt.TaylorGreenVortex(ctx, res, 1600, 0.05, stencil=lt.D3Q27(),
                            initialize_fneq=False)
sim = lt.Simulation(
    flow, lt.RegularizedCollision(tau=flow.units.relaxation_parameter_lu), [])
t0 = time.time()
sim(max(40, steps // 10))
print(f"warm {time.time()-t0:.1f}s path={sim.step_path}", flush=True)
mlups = sim(steps)
print(f"res={res} steps={steps} path={sim.step_path} "
      f"bt={os.environ.get('LETTUCE_BLOCK_TARGET')} "
      f"nsub={os.environ.get('LETTUCE_NSUB')} mlups={mlups:.1f}")
