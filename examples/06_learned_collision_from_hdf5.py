"""Learned collision trained END-TO-END from stored HDF5 data.

The full reference training pipeline (``lettuce/util/datautils.py`` +
torch DataLoader usage), jax-style:

1. run a simulation and store f snapshots with :class:`HDF5Reporter`;
2. stream (f, f_target) pairs from :class:`LettuceDataset` with its
   batching/shuffling ``loader()``;
3. train an MLP correction on top of the BGK step so one corrected step
   maps f_i to the stored f_{i+1} (one-step operator learning), with
   optax Adam and a jitted, vmapped update.

Run: python examples/06_learned_collision_from_hdf5.py
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # run from any cwd without installing

import lettuce_tpu as lt


def generate_dataset(filebase: str, resolution: int = 16,
                     num_steps: int = 96, interval: int = 4):
    """Store a TGV2D trajectory (f every ``interval`` steps) to HDF5."""
    context = lt.Context(dtype=jnp.float32)
    flow = lt.TaylorGreenVortex(context, resolution, reynolds_number=400,
                                mach_number=0.05, stencil=lt.D2Q9(),
                                initialize_fneq=False)
    collision = lt.BGKCollision(tau=flow.units.relaxation_parameter_lu)
    reporter = lt.HDF5Reporter(flow, collision, interval=interval,
                               filebase=filebase)
    simulation = lt.Simulation(flow, collision, [reporter])
    simulation(num_steps)
    reporter.close()
    return flow


def train(filebase: str, epochs: int = 20, batch_size: int = 4,
          lr: float = 1e-3, verbose: bool = True):
    """Train the MLP collision correction against the stored trajectory."""
    import optax

    dataset = lt.LettuceDataset(filebase, target=True)
    interval = int(dataset.metadata["interval"])
    resolution = dataset.metadata["resolution"]

    # the coarse model: plain BGK on the same flow configuration
    context = lt.Context(dtype=jnp.float32)
    flow = lt.TaylorGreenVortex(
        context, resolution,
        reynolds_number=dataset.metadata["reynolds_number"],
        mach_number=dataset.metadata["mach_number"], stencil=lt.D2Q9(),
        initialize_fneq=False)
    sim = lt.Simulation(
        flow, lt.BGKCollision(tau=flow.units.relaxation_parameter_lu), [])
    sim_step = sim.make_step_fn()

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {
        "w1": jax.random.normal(k1, (9, 16)) * 0.01,
        "w2": jax.random.normal(k2, (16, 9)) * 0.01,
    }

    def corrected_step(params, f):
        """One BGK step plus a learned, mass-conserving correction."""
        f = sim_step(f)
        rho = jnp.sum(f, axis=0, keepdims=True)
        feat = jnp.moveaxis(f / rho, 0, -1)
        h = jnp.tanh(feat @ params["w1"])
        delta = h @ params["w2"]
        delta = delta - delta.mean(axis=-1, keepdims=True)  # conserve mass
        return f + 1e-3 * jnp.moveaxis(delta, -1, 0) * rho

    def predict(params, f):
        """Advance one dataset interval with the corrected step."""
        for _ in range(interval):
            f = corrected_step(params, f)
        return f

    def loss_fn(params, f_batch, target_batch):
        pred = jax.vmap(lambda f: predict(params, f))(f_batch)
        return jnp.mean((pred - target_batch) ** 2)

    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def update(params, opt_state, f_batch, target_batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, f_batch,
                                                  target_batch)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for epoch in range(epochs):
        losses = []
        for f_b, tgt_b, _ in dataset.loader(batch_size=batch_size,
                                            shuffle=True, seed=epoch,
                                            drop_last=True):
            params, opt_state, loss = update(
                params, opt_state, jnp.asarray(f_b), jnp.asarray(tgt_b))
            losses.append(float(loss))
        history.append(float(np.mean(losses)))
        if verbose:
            print(f"epoch {epoch:3d}  loss {history[-1]:.3e}")
    dataset.close()
    return params, history


if __name__ == "__main__":
    with tempfile.TemporaryDirectory() as tmp:
        filebase = os.path.join(tmp, "tgv2d")
        generate_dataset(filebase)
        params, history = train(filebase)
        print(f"loss: {history[0]:.3e} -> {history[-1]:.3e}")
