"""Differentiable rollout: optimise a neural-network collision correction
through an unrolled simulation with jax.grad (BASELINE.json config 5; the
JAX analog of the reference's torch-autograd use case).

A tiny MLP perturbs the BGK relaxation; its parameters are trained so the
coarse simulation matches the analytic TGV decay.
"""

import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from any cwd without installing

import lettuce_tpu as lt


def make_flow():
    context = lt.Context(dtype=jnp.float32)
    return lt.TaylorGreenVortex(context, resolution=32, reynolds_number=400,
                                mach_number=0.05, stencil=lt.D2Q9(),
                                initialize_fneq=False)


flow = make_flow()
tau = flow.units.relaxation_parameter_lu
collision = lt.BGKCollision(tau)
sim = lt.Simulation(flow, collision, [])
sim_step = sim.make_step_fn()

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
params = {
    "w1": jax.random.normal(k1, (9, 16)) * 0.01,
    "w2": jax.random.normal(k2, (16, 9)) * 0.01,
}

STEPS = 50


def neural_step(params, f):
    """BGK step plus a learned, conservation-projected correction."""
    f = sim_step(f)
    # features: populations normalised by density
    rho = jnp.sum(f, axis=0, keepdims=True)
    feat = jnp.moveaxis(f / rho, 0, -1)
    h = jnp.tanh(feat @ params["w1"])
    delta = (h @ params["w2"])
    delta = delta - delta.mean(axis=-1, keepdims=True)  # conserve mass
    return f + 1e-3 * jnp.moveaxis(delta, -1, 0) * rho


def loss_fn(params, f0):
    f = f0
    for _ in range(STEPS):
        f = neural_step(params, f)
    p_ref, u_ref = flow.analytic_solution(
        t=flow.units.convert_time_to_pu(STEPS))
    u = flow.view(f).u_pu
    return jnp.mean((u - jnp.asarray(u_ref)) ** 2)


grad_fn = jax.jit(jax.value_and_grad(loss_fn))
f0 = flow.f
lr = 0.05
for it in range(10):
    loss, grads = grad_fn(params, f0)
    params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    print(f"iter {it}: loss {float(loss):.3e}")
print("gradients flow through the full rollout — training works.")
