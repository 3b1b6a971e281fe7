"""Sweep block targets / blocking depths for the regularized D3Q27 fragment.

Builds the flow once (init dominates wall-clock at 256^3), then sweeps
kernel configurations in-process via the env overrides read at
Simulation build time.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import lettuce_tpu as lt

res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 476

ctx = lt.Context(dtype=jnp.float32, use_native=True)
t0 = time.time()
flow = lt.TaylorGreenVortex(ctx, res, 1600, 0.05, stencil=lt.D3Q27(),
                            initialize_fneq=False)
print(f"flow built in {time.time()-t0:.0f}s", flush=True)
# keep the reset state on HOST: the kernel donates its input buffer, so a
# device-side reference would be deleted after the first config runs
f0 = np.asarray(flow.f)

CONFIGS = [
    # (block_target or None for default, nsub or None for auto)
    ("8,16", None),
    ("8,16", "1"),
    ("8,16", "4"),
    ("8,32", "2"),
    ("16,16", "2"),
]
if len(sys.argv) > 3:
    CONFIGS = [tuple(x if x != "-" else None for x in c.split(":"))
               for c in sys.argv[3].split(";")]

first = True
for bt, nsub in CONFIGS:
    for k, v in (("LETTUCE_BLOCK_TARGET", bt), ("LETTUCE_NSUB", nsub)):
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    if not first:
        flow.f = ctx.convert_to_tensor(f0)  # re-upload after donation
    first = False
    t0 = time.time()
    try:
        sim = lt.Simulation(
            flow,
            lt.RegularizedCollision(tau=flow.units.relaxation_parameter_lu),
            [])
        sim(max(40, steps // 10))
        mlups = sim(steps)
        print(f"bt={bt} nsub={nsub} path={sim.step_path} "
              f"mlups={mlups:.1f} ({time.time()-t0:.0f}s)", flush=True)
    except Exception as exc:
        print(f"bt={bt} nsub={nsub} FAILED {type(exc).__name__}: "
              f"{str(exc)[:200]}", flush=True)
