"""Adjoint inverse design: recover an unknown initial condition by
differentiating THROUGH the simulation.

A target TGV2D run produces a velocity field after N steps; starting
from rest we optimise the initial populations with jax.grad + optax Adam
so the rollout reproduces that field. This is the inverse-problem
counterpart of example 04's operator learning, exercising the same
differentiate-through-everything property the reference advertises
(``/root/reference/README.rst:27``) — here with the gradient flowing
through N full collide-and-stream steps (including the fused-kernel
path's custom_vjp when run with use_native=True on TPU).

Run: python examples/09_adjoint_initial_condition.py
"""

import jax
import jax.numpy as jnp
import optax

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from any cwd without installing

import lettuce_tpu as lt


RESOLUTION = 16
STEPS = 24


def make_flow():
    context = lt.Context(dtype=jnp.float32)
    return lt.TaylorGreenVortex(context, resolution=RESOLUTION,
                                reynolds_number=400, mach_number=0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)


flow = make_flow()
sim = lt.Simulation(
    flow, lt.BGKCollision(flow.units.relaxation_parameter_lu), [])

# checkpointed rollout: jax.checkpoint chunks (~sqrt(STEPS) steps each)
# bound the backward pass's residual memory at ~1.5x forward cost —
# the lever that extends differentiable rollouts ~10x past the
# store-every-step HBM cap (see docs/differentiability.md; at 256^3 a
# plain 48-step grad already fills 16 GB, a checkpointed 256-step one
# fits)
rollout = sim.make_segment_fn(STEPS,
                              checkpoint_every=max(2, int(STEPS ** 0.5)))


# target: the true TGV initial condition rolled out N steps
f_true = flow.f
u_target = flow.view(rollout(f_true)).u()

# start from rest (uniform equilibrium at rho=1, u=0)
rest = lt.TaylorGreenVortex(
    lt.Context(dtype=jnp.float32), resolution=RESOLUTION,
    reynolds_number=400, mach_number=0.05, stencil=lt.D2Q9(),
    initialize_fneq=False)
f_rest = rest.equilibrium(rest, jnp.ones((1,) + f_true.shape[1:]),
                          jnp.zeros((2,) + f_true.shape[1:]))


@jax.jit
def loss_fn(f0):
    u = flow.view(rollout(f0)).u()
    return jnp.mean((u - u_target) ** 2)


optimizer = optax.adam(2e-4)
opt_state = optimizer.init(f_rest)
grad_fn = jax.jit(jax.value_and_grad(loss_fn))

f0 = f_rest
for it in range(60):
    loss, g = grad_fn(f0)
    updates, opt_state = optimizer.update(g, opt_state)
    f0 = optax.apply_updates(f0, updates)
    if it % 10 == 0:
        print(f"iter {it:3d}  loss {float(loss):.3e}")

ic_err = float(jnp.abs(flow.view(f0).u() - flow.view(f_true).u()).max())
final = float(loss_fn(f0))
print(f"final rollout-velocity MSE: {final:.3e}")
print(f"recovered-IC max velocity error: {ic_err:.4f} "
      f"(initial guess was at rest)")
