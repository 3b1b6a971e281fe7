"""Multi-chip sharding equivalence: the distributed analog of the
reference's native-vs-python suite (tests/native/) — N-device sharded steps
must match the single-device step bitwise in f64."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lettuce_tpu as lt

# compile-heavy: ~40 min on CPU (8 virtual devices) — excluded from the fast tier (-m "not slow")
pytestmark = pytest.mark.slow
from tests.conftest import TestFlow


@pytest.fixture
def ctx64():
    # use_native=False: these tests assert BITWISE jnp-vs-sharded-jnp
    # equality, which requires identical op order on both sides (with
    # ghost-image padding the kernel now engages even on small grids and
    # differs from jnp at the last ulp — fused-kernel sharding equivalence
    # is covered by the dedicated *_native tests below)
    return lt.Context(dtype=jnp.float64, use_native=False)


def _tgv(ctx, res=32, stencil=None):
    return lt.TaylorGreenVortex(ctx, res, 100, 0.05,
                                stencil=stencil or lt.D2Q9())


def test_sharded_matches_single_device_periodic(ctx64):
    assert len(jax.devices()) >= 8, "conftest should give 8 virtual devices"
    flow_ref = _tgv(ctx64)
    sim_ref = lt.Simulation(
        flow_ref, lt.BGKCollision(flow_ref.units.relaxation_parameter_lu),
        [])
    sim_ref(10)

    flow_sh = _tgv(ctx64)
    decomp = lt.DomainDecomposition(mesh_shape=(8,))
    sim_sh = lt.Simulation(
        flow_sh, lt.BGKCollision(flow_sh.units.relaxation_parameter_lu),
        [], decomposition=decomp)
    sim_sh(10)

    np.testing.assert_array_equal(np.asarray(flow_sh.f),
                                  np.asarray(flow_ref.f))


def test_sharded_2d_mesh(ctx64):
    flow_ref = _tgv(ctx64, res=16)
    sim_ref = lt.Simulation(
        flow_ref, lt.BGKCollision(flow_ref.units.relaxation_parameter_lu),
        [])
    sim_ref(5)

    flow_sh = _tgv(ctx64, res=16)
    decomp = lt.DomainDecomposition(mesh_shape=(4, 2))
    sim_sh = lt.Simulation(
        flow_sh, lt.BGKCollision(flow_sh.units.relaxation_parameter_lu),
        [], decomposition=decomp)
    sim_sh(5)

    np.testing.assert_array_equal(np.asarray(flow_sh.f),
                                  np.asarray(flow_ref.f))


def test_sharded_with_boundaries(ctx64):
    """Pointwise boundaries (bounce back / equilibrium PU) shard cleanly."""
    def make():
        return lt.CouetteFlow2D(ctx64, 16, reynolds_number=10,
                                mach_number=0.05)

    flow_ref = make()
    sim_ref = lt.Simulation(
        flow_ref, lt.BGKCollision(flow_ref.units.relaxation_parameter_lu),
        [])
    sim_ref(10)

    flow_sh = make()
    # shard x (axis 0); the walls span y faces, which stay local
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(
        flow_sh, lt.BGKCollision(flow_sh.units.relaxation_parameter_lu),
        [], decomposition=decomp)
    sim_sh(10)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=1e-14)


def test_sharded_stream_matches_roll(ctx64):
    """sharded_stream == jnp.roll streaming on a random field."""
    from functools import partial
    from lettuce_tpu.ops.streaming import stream
    from lettuce_tpu.parallel import sharded_stream
    from lettuce_tpu.parallel._shard_map_compat import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    stencil = lt.D3Q19()
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.rand(19, 8, 8, 8))

    expected = np.asarray(stream(f, stencil.e))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("sx", "sy"))
    spec = P(None, "sx", "sy", None)
    mapped = shard_map(
        lambda fl: sharded_stream(fl, stencil.e,
                                  {0: ("sx", 4), 1: ("sy", 2)}),
        mesh=mesh, in_specs=(spec,), out_specs=spec)
    got = np.asarray(mapped(f))
    np.testing.assert_array_equal(got, expected)


def test_sharded_native_kernel_matches_single_device():
    """Fused Pallas kernel under shard_map (locally periodic + ppermute
    halo fix-up) matches the single-device kernel path."""
    def make(native):
        ctx = lt.Context(dtype=jnp.float32, use_native=native)
        return lt.TaylorGreenVortex(ctx, [64, 16, 128], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)

    flow_ref = make(True)
    sim_ref = lt.Simulation(
        flow_ref, lt.BGKCollision(flow_ref.units.relaxation_parameter_lu),
        [])
    assert sim_ref._step_kind == "pallas"
    sim_ref(5)

    flow_sh = make(True)
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(
        flow_sh, lt.BGKCollision(flow_sh.units.relaxation_parameter_lu),
        [], decomposition=decomp)
    sim_sh(5)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=1e-6)


def test_sharded_native_with_boundaries():
    """Sharded fused kernel with bounce-back + equilibrium walls."""
    def make(native):
        ctx = lt.Context(dtype=jnp.float32, use_native=native)
        return lt.CouetteFlow2D(ctx, [64, 128], reynolds_number=10,
                                mach_number=0.05)

    flow_ref = make(True)
    sim_ref = lt.Simulation(
        flow_ref, lt.BGKCollision(flow_ref.units.relaxation_parameter_lu),
        [])
    assert sim_ref._step_kind == "pallas"
    sim_ref(6)

    flow_sh = make(True)
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(
        flow_sh, lt.BGKCollision(flow_sh.units.relaxation_parameter_lu),
        [], decomposition=decomp)
    sim_sh(6)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=1e-6)


def test_sharded_half_storage():
    """bf16 deviation storage under sharding: fused kernel per shard,
    edge planes decoded/collided/encoded around the ppermute exchange."""
    def make():
        ctx = lt.Context(dtype=jnp.float32, use_native=True)
        return lt.TaylorGreenVortex(ctx, [64, 16, 128], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)

    flow_ref = make()
    sim_ref = lt.Simulation(
        flow_ref, lt.BGKCollision(flow_ref.units.relaxation_parameter_lu),
        [], half_storage=True)
    sim_ref(10)

    flow_sh = make()
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(
        flow_sh, lt.BGKCollision(flow_sh.units.relaxation_parameter_lu),
        [], decomposition=decomp, half_storage=True)
    assert sim_sh._step_dev is not None
    sim_sh(10)

    a, b = np.asarray(flow_sh.f), np.asarray(flow_ref.f)
    # edge planes take one extra bf16 round-trip through the exchange
    np.testing.assert_allclose(a, b, atol=2e-4)
    np.testing.assert_allclose(a.sum(), 64 * 16 * 128, rtol=1e-4)


def test_sharded_half_storage_mrt_dhumieres():
    """The folded d'Humieres MRT fragment (shift-invariant in f - feq)
    composes with bf16 deviation storage under sharding too."""
    def make():
        ctx = lt.Context(dtype=jnp.float32, use_native=True)
        return lt.TaylorGreenVortex(ctx, [64, 16, 128], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)

    def collision(flow):
        transform = lt.D3Q19DHumieres(flow.stencil, flow.context)
        taus = [1.0, 1.2, 1.1, 1.0, 1.3, 1.0, 1.3, 1.0, 1.3,
                0.9, 1.1, 0.9, 1.1, 0.9, 0.9, 0.9, 1.2, 1.2, 1.2]
        return lt.MRTCollision(transform, taus, flow.context)

    flow_ref = make()
    sim_ref = lt.Simulation(flow_ref, collision(flow_ref), [],
                            half_storage=True)
    assert sim_ref._step_dev is not None
    sim_ref(10)

    flow_sh = make()
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(flow_sh, collision(flow_sh), [],
                           decomposition=decomp, half_storage=True)
    assert sim_sh._step_dev is not None
    sim_sh(10)

    a, b = np.asarray(flow_sh.f), np.asarray(flow_ref.f)
    np.testing.assert_allclose(a, b, atol=2e-4)
    np.testing.assert_allclose(a.sum(), 64 * 16 * 128, rtol=1e-4)


def test_sharded_obstacle_flow(ctx64):
    """The flagship open-boundary case (inlet + anti-bounce-back outlet +
    obstacle) under sharding. The outlet face spans x=-1, so the domain is
    sharded along y (the face axis stays shard-local and the pointwise/
    roll outlet formulation is exact per shard)."""
    def make():
        flow = lt.Obstacle(ctx64, [24, 16], reynolds_number=50,
                           mach_number=0.05, domain_length_x=2.4)
        x, y = [np.asarray(g) for g in flow.grid]
        flow.mask = (x - 1.0) ** 2 + (y - 0.8) ** 2 < 0.04
        return flow

    flow_ref = make()
    sim_ref = lt.Simulation(
        flow_ref, lt.BGKCollision(flow_ref.units.relaxation_parameter_lu),
        [])
    sim_ref(20)

    flow_sh = make()
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(1,))
    sim_sh = lt.Simulation(
        flow_sh, lt.BGKCollision(flow_sh.units.relaxation_parameter_lu),
        [], decomposition=decomp)
    sim_sh(20)

    np.testing.assert_array_equal(np.asarray(flow_sh.f),
                                  np.asarray(flow_ref.f))


def test_sharded_hybrid_outlet_native():
    """The flagship open-boundary case rides the fused kernel under
    sharding (VERDICT r2 item 2): the outlet planes are rewritten by a
    shard-local window replay, and the ppermute edge fix then corrects
    the replay's locally-wrapped shard-edge planes. Matches the
    single-device kernel+hybrid path to f32 roundoff."""
    def make():
        ctx = lt.Context(dtype=jnp.float32, use_native=True)
        flow = lt.Obstacle(ctx, [32, 1024], reynolds_number=50,
                           mach_number=0.05, domain_length_x=3.2)
        x, y = [np.asarray(g) for g in flow.grid]
        flow.mask = (x - 1.6) ** 2 + (y - 51.2) ** 2 < 0.16
        return flow

    flow_ref = make()
    sim_ref = lt.Simulation(
        flow_ref, lt.BGKCollision(flow_ref.units.relaxation_parameter_lu),
        [])
    assert sim_ref._step_kind == "pallas"
    sim_ref(8)

    flow_sh = make()
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(1,))
    sim_sh = lt.Simulation(
        flow_sh, lt.BGKCollision(flow_sh.units.relaxation_parameter_lu),
        [], decomposition=decomp)
    assert sim_sh._step.step_path == "pallas+hybrid"
    sim_sh(8)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=1e-6)


def test_sharded_outlet_face_axis_guard(ctx64):
    """Sharding an outlet's face axis IS supported (the outlet only
    writes the global face plane) — but the two configurations that
    would silently compute garbage are rejected with clear errors:
    a local extent too small to keep the inward-neighbour read local,
    and outlets carrying face-extent fields (SpongeOutlet's per-plane
    sigma cannot broadcast against a local slab)."""
    flow = lt.Obstacle(ctx64, [8, 16], reynolds_number=50,
                       mach_number=0.05, domain_length_x=2.4)
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    with pytest.raises(AssertionError, match="shard other axes"):
        lt.Simulation(flow,
                      lt.BGKCollision(flow.units.relaxation_parameter_lu),
                      [], decomposition=decomp)

    flow2 = TestFlow(ctx64, resolution=[64, 16], stencil=lt.D2Q9())
    flow2._boundaries = [lt.SpongeOutlet([1, 0], flow2, depth=4)]
    decomp2 = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    with pytest.raises(AssertionError, match="face axis cannot be sharded"):
        lt.Simulation(flow2, lt.BGKCollision(0.8), [],
                      decomposition=decomp2)


def _pernode_inlet_flow(ctx, resolution, vel_scale=0.05):
    mask = np.zeros(tuple(resolution), dtype=bool)
    mask[0, :] = True
    rng = np.random.RandomState(7)
    vel = rng.rand(2, *resolution) * vel_scale
    return TestFlow(ctx, resolution=list(resolution), stencil=lt.D2Q9(),
                    boundaries=[lt.EquilibriumBoundaryPU(
                        ctx, mask, vel, 0.001)])


def test_sharded_per_node_inlet(ctx64):
    """Per-node EquilibriumBoundaryPU under sharding: the combined feq
    field travels as a shard_map operand, cut to local shards."""
    flow_ref = _pernode_inlet_flow(ctx64, (16, 16))
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(0.8), [])
    sim_ref(8)

    flow_sh = _pernode_inlet_flow(ctx64, (16, 16))
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(0.8), [],
                           decomposition=decomp)
    sim_sh(8)

    # the combined feq field is precomputed eagerly while the single-device
    # path traces feq inline, so XLA fusion differs by ~1 ulp
    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-14)


def test_sharded_native_per_node_inlet():
    """Sharded fused kernel with a per-node equilibrium inlet (feq field
    as a per-shard kernel input)."""
    def make():
        ctx = lt.Context(dtype=jnp.float32, use_native=True)
        return _pernode_inlet_flow(ctx, (64, 128))

    flow_ref = make()
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(0.8), [])
    assert sim_ref._step_kind == "pallas"
    sim_ref(6)

    flow_sh = make()
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(0.8), [],
                           decomposition=decomp)
    sim_sh(6)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=1e-6)


def test_sharded_half_storage_per_node_inlet():
    """bf16 deviation storage + sharding + per-node equilibrium inlet all
    compose (the feq field is encoded to deviations inside the kernel)."""
    def make():
        ctx = lt.Context(dtype=jnp.float32, use_native=True)
        return _pernode_inlet_flow(ctx, (64, 128))

    flow_ref = make()
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(0.8), [],
                            half_storage=True)
    assert sim_ref._step_dev is not None
    sim_ref(6)

    flow_sh = make()
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(0.8), [],
                           decomposition=decomp, half_storage=True)
    assert sim_sh._step_dev is not None
    sim_sh(6)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=2e-4)


def test_sharded_temporal_blocking(monkeypatch):
    """Per-shard temporal blocking: span planes exchanged once per span
    steps, blocked kernel on the extended slab, interior kept — matches
    the single-device kernel path."""
    monkeypatch.setenv("LETTUCE_NSUB", "2")

    def make():
        ctx = lt.Context(dtype=jnp.float32, use_native=True)
        return lt.TaylorGreenVortex(ctx, [64, 16, 128], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)

    flow_sh = make()
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim_sh._step_multi is not None and sim_sh._step_multi[1] == 2
    sim_sh(6)  # 3 blocked launches

    monkeypatch.delenv("LETTUCE_NSUB")
    flow_ref = make()
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [])
    assert sim_ref._step_kind == "pallas"
    sim_ref(6)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=1e-6)


@pytest.mark.parametrize("make_collision,stencil_cls", [
    (lambda flow: lt.SmagorinskyCollision(
        tau=flow.units.relaxation_parameter_lu), lt.D3Q27),
    (lambda flow: lt.MRTCollision(
        lt.D3Q27Hermite(flow.torch_stencil, flow.context),
        relaxation_parameters=np.full(
            27, 1.0 / flow.units.relaxation_parameter_lu)), lt.D3Q27),
    (lambda flow: lt.MRTCollision(
        lt.D3Q19DHumieres(flow.torch_stencil, flow.context),
        relaxation_parameters=np.full(
            19, 1.0 / flow.units.relaxation_parameter_lu)), lt.D3Q19),
], ids=["smagorinsky", "mrt_hermite", "mrt_dhumieres19"])
def test_sharded_les_collisions(ctx64, make_collision, stencil_cls):
    """BASELINE config 4 coverage: MRT (D3Q27 Hermite / D3Q19 d'Humieres)
    and Smagorinsky LES under grid sharding match the single-device step
    (bitwise for pointwise collisions; MRT's moment-space matmul
    reassociates with the shard shape, so it matches to f64 roundoff)."""
    def make_flow():
        # minor axis deliberately not a multiple of 128 so both sides run
        # the jnp step (bitwise comparison needs identical op order)
        return lt.DecayingTurbulence(ctx64, [16, 16, 64], 400, 0.05,
                                     k0=4, stencil=stencil_cls(),
                                     randseed=3, initialize_fneq=False)

    flow_ref = make_flow()
    sim_ref = lt.Simulation(flow_ref, make_collision(flow_ref), [])
    sim_ref(5)

    flow_sh = make_flow()
    decomp = lt.DomainDecomposition(mesh_shape=(8,))
    sim_sh = lt.Simulation(flow_sh, make_collision(flow_sh), [],
                           decomposition=decomp)
    sim_sh(5)

    if isinstance(sim_sh.collision, lt.MRTCollision):
        np.testing.assert_allclose(np.asarray(flow_sh.f),
                                   np.asarray(flow_ref.f),
                                   rtol=1e-13, atol=0)
    else:
        np.testing.assert_array_equal(np.asarray(flow_sh.f),
                                      np.asarray(flow_ref.f))


def test_sharded_2dmesh_native_kernel():
    """Fused kernel on a 2D (x, y) device mesh: per-step y-halo +
    x-halo exchange (corners ride the second exchange), kernel on the
    extended locally-periodic slab, interior kept. Matches the
    single-device kernel to f64 roundoff."""
    ctx = lt.Context(dtype=jnp.float64, use_native=True)

    def make():
        return lt.TaylorGreenVortex(ctx, [16, 64, 128], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)

    flow_ref = make()
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [])
    assert sim_ref._step_kind == "pallas"
    sim_ref(4)

    flow_sh = make()
    decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim_sh._step.step_path == "pallas"  # ly=16 > the 8-plane halo
    sim_sh(4)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_2dmesh_native_with_boundaries():
    """2D-mesh kernel with mask-coded boundaries: the extended static
    mask windows hand each shard its halo-correct mask."""
    from tests.conftest import TestFlow
    ctx = lt.Context(dtype=jnp.float64, use_native=True)
    mask = np.zeros((16, 32, 128), dtype=bool)
    mask[0, :, :] = True      # wall plane crossing every y shard
    mask[:, 0, :] = True      # wall plane crossing every x shard

    def make():
        return TestFlow(ctx, resolution=[16, 32, 128],
                        stencil=lt.D3Q19(),
                        boundaries=[lt.BounceBackBoundary(mask)])

    flow_ref = make()
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(0.8), [])
    assert sim_ref._step_kind == "pallas"
    sim_ref(4)

    flow_sh = make()
    decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(0.8), [],
                           decomposition=decomp)
    sim_sh(4)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_2dmesh_half_storage():
    """bf16 deviation storage on the 2D-mesh kernel path (16-plane y
    halo for the bf16 merged-row depth)."""
    def make():
        ctx = lt.Context(dtype=jnp.float32, use_native=True)
        return lt.TaylorGreenVortex(ctx, [16, 128, 128], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)

    flow_ref = make()
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [], half_storage=True)
    assert sim_ref._step_dev is not None
    sim_ref(6)

    flow_sh = make()
    decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp,
        half_storage=True)
    assert sim_sh._step_dev is not None
    sim_sh(6)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=2e-4)


def test_sharded_temporal_blocking_with_boundaries(monkeypatch):
    """Temporal blocking under sharding with mask-coded boundaries: the
    static mask slabs ride the same halo exchange as f, so the blocked
    kernel sees halo-correct masks (an obstacle block deliberately
    crosses a shard boundary)."""
    from tests.conftest import TestFlow
    monkeypatch.setenv("LETTUCE_NSUB", "2")
    ctx = lt.Context(dtype=jnp.float64, use_native=True)
    mask = np.zeros((64, 16, 128), dtype=bool)
    mask[:, 0, :] = True        # wall plane crossing every x shard
    mask[30:34, 6:10, :] = True  # obstacle across the x=32 shard cut

    def make():
        return TestFlow(ctx, resolution=[64, 16, 128],
                        stencil=lt.D3Q19(),
                        boundaries=[lt.BounceBackBoundary(mask)])

    flow_sh = make()
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(0.8), [],
                           decomposition=decomp)
    assert sim_sh._step_multi is not None and sim_sh._step_multi[1] == 2
    sim_sh(6)

    monkeypatch.delenv("LETTUCE_NSUB")
    ctx_ref = lt.Context(dtype=jnp.float64, use_native=False)

    def make_ref():
        return TestFlow(ctx_ref, resolution=[64, 16, 128],
                        stencil=lt.D3Q19(),
                        boundaries=[lt.BounceBackBoundary(mask)])

    flow_ref = make_ref()
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(0.8), [])
    sim_ref(6)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_temporal_blocking_per_node_inlet(monkeypatch):
    """Temporal blocking under sharding with a per-node equilibrium
    inlet: the combined feq field is extended by the same halo exchange
    and applied on every sub-step."""
    monkeypatch.setenv("LETTUCE_NSUB", "2")
    ctx = lt.Context(dtype=jnp.float64, use_native=True)

    flow_sh = _pernode_inlet_flow(ctx, (64, 128))
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(0.8), [],
                           decomposition=decomp)
    assert sim_sh._step_multi is not None and sim_sh._step_multi[1] == 2
    sim_sh(6)

    monkeypatch.delenv("LETTUCE_NSUB")
    ctx_ref = lt.Context(dtype=jnp.float64, use_native=False)
    flow_ref = _pernode_inlet_flow(ctx_ref, (64, 128))
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(0.8), [])
    sim_ref(6)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_2dmesh_temporal_blocking_masked(monkeypatch):
    """Temporal blocking on the 2D-mesh kernel path with mask-coded
    walls: masks take the y-halo and x-halo exchanges too."""
    from tests.conftest import TestFlow
    monkeypatch.setenv("LETTUCE_NSUB", "2")
    ctx = lt.Context(dtype=jnp.float64, use_native=True)
    mask = np.zeros((32, 128, 128), dtype=bool)
    mask[0, :, :] = True    # wall plane crossing every y shard
    mask[:, 0, :] = True    # wall plane crossing every x shard

    def make(c):
        return TestFlow(c, resolution=[32, 128, 128],
                        stencil=lt.D3Q19(),
                        boundaries=[lt.BounceBackBoundary(mask)])

    flow_sh = make(ctx)
    decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(0.8), [],
                           decomposition=decomp)
    assert sim_sh._step_multi is not None and sim_sh._step_multi[1] == 2
    sim_sh(4)

    monkeypatch.delenv("LETTUCE_NSUB")
    ctx_ref = lt.Context(dtype=jnp.float64, use_native=False)
    flow_ref = make(ctx_ref)
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(0.8), [])
    sim_ref(4)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_2dmesh_temporal_blocking(monkeypatch):
    """Temporal blocking on the 2D-mesh kernel path: n_sub x planes and
    a doubled y halo exchanged once per n_sub steps."""
    monkeypatch.setenv("LETTUCE_NSUB", "2")
    ctx = lt.Context(dtype=jnp.float64, use_native=True)

    def make():
        return lt.TaylorGreenVortex(ctx, [32, 128, 128], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)

    flow_sh = make()
    decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim_sh._step_multi is not None and sim_sh._step_multi[1] == 2
    sim_sh(4)

    monkeypatch.delenv("LETTUCE_NSUB")
    flow_ref = make()
    ctx_ref = lt.Context(dtype=jnp.float64, use_native=False)
    flow_ref.context = ctx_ref
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [])
    sim_ref(4)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_native_padded_minor():
    """Ghost-image padding composes with 1D sharding: a 96-lane minor
    axis (not a multiple of 128) pads per shard, the kernel runs fused,
    and the result matches the plain jnp path. Padding on unsharded axes
    commutes with the sharded step — the periodic images are local in
    the sharded axis."""
    def make(native):
        ctx = lt.Context(dtype=jnp.float64, use_native=native)
        return lt.TaylorGreenVortex(ctx, [64, 16, 96], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)

    flow_ref = make(False)
    sim_ref = lt.Simulation(
        flow_ref, lt.BGKCollision(flow_ref.units.relaxation_parameter_lu),
        [])
    sim_ref(6)

    flow_sh = make(True)
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(
        flow_sh, lt.BGKCollision(flow_sh.units.relaxation_parameter_lu),
        [], decomposition=decomp)
    assert sim_sh._step.step_path == "pallas"
    assert sim_sh._step.pad_codec is not None
    sim_sh(6)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_native_padded_boundaries():
    """Padded sharded kernel with mask-coded walls (Couette at a
    non-aligned 100-lane minor axis): padded static masks give ghost
    nodes their sources' physics."""
    def make(native):
        ctx = lt.Context(dtype=jnp.float64, use_native=native)
        return lt.CouetteFlow2D(ctx, [64, 100], reynolds_number=10,
                                mach_number=0.05)

    flow_ref = make(False)
    sim_ref = lt.Simulation(
        flow_ref, lt.BGKCollision(flow_ref.units.relaxation_parameter_lu),
        [])
    sim_ref(6)

    flow_sh = make(True)
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(
        flow_sh, lt.BGKCollision(flow_sh.units.relaxation_parameter_lu),
        [], decomposition=decomp)
    assert sim_sh._step.step_path == "pallas"
    assert sim_sh._step.pad_codec is not None
    sim_sh(6)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_hybrid_outlet_native_padded():
    """The sharded hybrid outlet fix-up composes with ghost-image
    padding: a 3D obstacle flow with a 96-lane minor axis runs
    pallas+hybrid under y sharding and matches the jnp path (window
    replay strips transverse ghost bands; post-step refresh
    re-propagates the corrections)."""
    def make(native):
        ctx = lt.Context(dtype=jnp.float64, use_native=native)
        flow = lt.Obstacle(ctx, [16, 64, 96], reynolds_number=50,
                           mach_number=0.05, domain_length_x=1.6)
        x, y, z = [np.asarray(g) for g in flow.grid]
        flow.mask = ((x - 0.8) ** 2 + (y - 3.2) ** 2
                     + (z - 4.8) ** 2) < 0.04
        return flow

    flow_ref = make(False)
    sim_ref = lt.Simulation(
        flow_ref, lt.BGKCollision(flow_ref.units.relaxation_parameter_lu),
        [])
    sim_ref(4)

    flow_sh = make(True)
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(1,))
    sim_sh = lt.Simulation(
        flow_sh, lt.BGKCollision(flow_sh.units.relaxation_parameter_lu),
        [], decomposition=decomp)
    assert sim_sh._step.step_path == "pallas+hybrid"
    assert sim_sh._step.pad_codec is not None
    sim_sh(4)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_half_storage_padded():
    """bf16 deviation storage + sharding + ghost-image padding all
    compose (the pad codec wraps the deviation codec per compiled
    segment)."""
    def make():
        ctx = lt.Context(dtype=jnp.float32, use_native=True)
        return lt.TaylorGreenVortex(ctx, [64, 16, 96], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)

    flow_ref = make()
    sim_ref = lt.Simulation(
        flow_ref, lt.BGKCollision(flow_ref.units.relaxation_parameter_lu),
        [], half_storage=True)
    assert sim_ref._step_dev is not None
    sim_ref(6)

    flow_sh = make()
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(
        flow_sh, lt.BGKCollision(flow_sh.units.relaxation_parameter_lu),
        [], decomposition=decomp, half_storage=True)
    assert sim_sh._step_dev is not None
    assert sim_sh._step_dev.pad_codec is not None
    sim_sh(6)

    a, b = np.asarray(flow_sh.f), np.asarray(flow_ref.f)
    np.testing.assert_allclose(a, b, atol=2e-4)
    np.testing.assert_allclose(a.sum(), 64 * 16 * 96, rtol=1e-4)


def test_sharded_temporal_blocking_padded(monkeypatch):
    """Temporal blocking under sharding composes with ghost-image
    padding: the in-slab sub-steps keep the images valid (n_sub is
    capped at the image depth), and the pad codec converts once per
    compiled segment."""
    monkeypatch.setenv("LETTUCE_NSUB", "2")

    def make(native):
        ctx = lt.Context(dtype=jnp.float64, use_native=native)
        return lt.TaylorGreenVortex(ctx, [64, 16, 96], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)

    flow_sh = make(True)
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim_sh._step_multi is not None and sim_sh._step_multi[1] == 2
    assert sim_sh._step_multi[0].pad_plan is not None
    sim_sh(6)  # 3 blocked launches

    monkeypatch.delenv("LETTUCE_NSUB")
    flow_ref = make(False)
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [])
    sim_ref(6)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_2dmesh_native_padded():
    """The 2D-device-mesh kernel path composes with ghost-image padding
    on the (unsharded) minor axis."""
    def make(native):
        ctx = lt.Context(dtype=jnp.float64, use_native=native)
        return lt.TaylorGreenVortex(ctx, [16, 64, 96], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)

    flow_ref = make(False)
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [])
    sim_ref(4)

    flow_sh = make(True)
    decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim_sh._step.step_path == "pallas"
    assert sim_sh._step.pad_codec is not None
    sim_sh(4)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_2dmesh_temporal_blocking_padded(monkeypatch):
    """Temporal blocking on the 2D-mesh path with a padded minor axis."""
    monkeypatch.setenv("LETTUCE_NSUB", "2")

    def make(native):
        ctx = lt.Context(dtype=jnp.float64, use_native=native)
        return lt.TaylorGreenVortex(ctx, [32, 128, 96], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)

    flow_sh = make(True)
    decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim_sh._step_multi is not None and sim_sh._step_multi[1] == 2
    assert sim_sh._step_multi[0].pad_plan is not None
    sim_sh(4)

    monkeypatch.delenv("LETTUCE_NSUB")
    flow_ref = make(False)
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [])
    sim_ref(4)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_2dmesh_2dgrid_native():
    """2D grids on a 2D (x, y) device mesh ride the fused kernel via the
    extended-slab trick: y (the minor axis) exchanges a one-tile 128-lane
    halo per side, keeping the extended minor extent lane-aligned."""
    def make(native):
        ctx = lt.Context(dtype=jnp.float64, use_native=native)
        return lt.TaylorGreenVortex(ctx, [16, 512], 100, 0.05,
                                    stencil=lt.D2Q9(),
                                    initialize_fneq=False)

    flow_ref = make(False)
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [])
    sim_ref(5)

    flow_sh = make(True)
    decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim_sh._step.step_path == "pallas"
    sim_sh(5)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_2dmesh_2dgrid_boundaries():
    """2D-mesh 2D-grid kernel with mask-coded walls crossing both shard
    cuts (the extended static mask windows carry the halos)."""
    from tests.conftest import TestFlow
    mask = np.zeros((16, 512), dtype=bool)
    mask[0, :] = True     # wall crossing every y shard
    mask[:, 0] = True     # wall crossing every x shard

    def make(native):
        ctx = lt.Context(dtype=jnp.float64, use_native=native)
        return TestFlow(ctx, resolution=[16, 512], stencil=lt.D2Q9(),
                        boundaries=[lt.BounceBackBoundary(mask)])

    flow_ref = make(False)
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(0.8), [])
    sim_ref(5)

    flow_sh = make(True)
    decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(0.8), [],
                           decomposition=decomp)
    assert sim_sh._step.step_path == "pallas"
    sim_sh(5)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_2dmesh_2dgrid_temporal_blocking(monkeypatch):
    """Temporal blocking for 2D grids on a 2D mesh: n_sub x planes and
    the 128-lane y halo exchanged once per n_sub steps."""
    monkeypatch.setenv("LETTUCE_NSUB", "2")

    def make(native):
        ctx = lt.Context(dtype=jnp.float64, use_native=native)
        return lt.TaylorGreenVortex(ctx, [32, 512], 100, 0.05,
                                    stencil=lt.D2Q9(),
                                    initialize_fneq=False)

    flow_sh = make(True)
    decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim_sh._step_multi is not None and sim_sh._step_multi[1] == 2
    sim_sh(6)  # 3 blocked launches

    monkeypatch.delenv("LETTUCE_NSUB")
    flow_ref = make(False)
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [])
    sim_ref(6)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_2dmesh_2dgrid_half_storage():
    """bf16 deviation storage on the 2D-mesh 2D-grid kernel path."""
    def make():
        ctx = lt.Context(dtype=jnp.float32, use_native=True)
        return lt.TaylorGreenVortex(ctx, [16, 512], 100, 0.05,
                                    stencil=lt.D2Q9(),
                                    initialize_fneq=False)

    flow_ref = make()
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [], half_storage=True)
    assert sim_ref._step_dev is not None
    sim_ref(6)

    flow_sh = make()
    decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp,
        half_storage=True)
    assert sim_sh._step_dev is not None
    sim_sh(6)

    a, b = np.asarray(flow_sh.f), np.asarray(flow_ref.f)
    np.testing.assert_allclose(a, b, atol=2e-4)
    np.testing.assert_allclose(a.sum(), 16 * 512, rtol=1e-4)


def test_sharded_native_step_differentiable():
    """jax.grad flows through the sharded fused-kernel step — backward is
    the per-shard adjoint Pallas kernel with the transposed edge-plane
    exchange — and matches the sharded jnp path's gradient."""
    grads = {}
    for use_native in (False, True):
        ctx = lt.Context(dtype=jnp.float32, use_native=use_native)
        flow = lt.TaylorGreenVortex(ctx, [64, 16, 128], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)
        decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
        sim = lt.Simulation(flow, lt.BGKCollision(
            flow.units.relaxation_parameter_lu), [], decomposition=decomp)
        if use_native:
            assert sim._step.step_path == "pallas"
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


def test_sharded_native_step_differentiable_padded():
    """Gradients also flow when the sharded kernel runs on a ghost-image
    padded representation (the vjp twin pads/unpads around the sharded
    jnp step)."""
    grads = {}
    for use_native in (False, True):
        ctx = lt.Context(dtype=jnp.float32, use_native=use_native)
        flow = lt.TaylorGreenVortex(ctx, [64, 16, 96], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)
        decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
        sim = lt.Simulation(flow, lt.BGKCollision(
            flow.units.relaxation_parameter_lu), [], decomposition=decomp)
        if use_native:
            assert sim._step.step_path == "pallas"
            assert sim._step.pad_codec is not None
        step = sim.make_step_fn()

        def loss(f, step=step, view=flow.view):
            return jnp.sum(view(step(f)).incompressible_energy())

        grads[use_native] = np.asarray(jax.grad(loss)(flow.f))

    assert np.all(np.isfinite(grads[True]))
    assert float(np.abs(grads[True]).max()) > 0
    np.testing.assert_allclose(grads[True], grads[False], atol=1e-5)


def test_sharded_adjoint_masked_frozen_f64():
    """Sharded adjoint kernel with bounce-back walls + frozen populations,
    including a frozen plane that IS the first plane of a shard: its
    edge-entry cotangent keeps must ride the plane-collide vjp (the
    globally-shifted nsm pair cannot distinguish my first plane from the
    neighbour's inside the kernel). f64, machine-precision match vs the
    sharded jnp path."""
    grads = {}
    for use_native in (False, True):
        ctx = lt.Context(dtype=jnp.float64, use_native=use_native)

        class FrozenWall(lt.BounceBackBoundary):
            def make_no_streaming_mask(self, shape, context):
                m = np.zeros(tuple(shape), dtype=bool)
                m[:, 8, :, :] = True  # first plane of shard 1 (lx = 8)
                return context.convert_to_tensor(m)

        mask = np.zeros((64, 16, 128), dtype=bool)
        mask[:, 0, :] = True  # wall on an unsharded axis
        flow = TestFlow(ctx, resolution=[64, 16, 128], stencil=lt.D3Q19(),
                        boundaries=[FrozenWall(mask)])
        decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
        sim = lt.Simulation(flow, lt.BGKCollision(0.8), [],
                            decomposition=decomp)
        if use_native:
            assert sim._step.step_path == "pallas"
            assert getattr(sim._step, "adjoint_kernel", False)
        step = sim.make_step_fn()

        def loss(f, step=step, view=flow.view):
            for _ in range(2):
                f = step(f)
            return jnp.sum(view(f).incompressible_energy())

        grads[use_native] = np.asarray(jax.grad(loss)(flow.f))

    assert np.all(np.isfinite(grads[True]))
    assert float(np.abs(grads[True]).max()) > 0
    scale = float(np.abs(grads[False]).max())
    np.testing.assert_allclose(grads[True], grads[False],
                               atol=1e-12 * scale)


def test_sharded_adjoint_trt_f64():
    """TRT's symmetric relaxation matrix rides the sharded adjoint kernel
    (t = M h per shard) with the same transposed edge exchange."""
    grads = {}
    for use_native in (False, True):
        ctx = lt.Context(dtype=jnp.float64, use_native=use_native)
        flow = lt.TaylorGreenVortex(ctx, [64, 16, 128], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)
        decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
        sim = lt.Simulation(flow, lt.TRTCollision(0.8, 0.95), [],
                            decomposition=decomp)
        if use_native:
            assert getattr(sim._step, "adjoint_kernel", False)
        step = sim.make_step_fn()

        def loss(f, step=step, view=flow.view):
            for _ in range(2):
                f = step(f)
            return jnp.sum(view(f).incompressible_energy())

        grads[use_native] = np.asarray(jax.grad(loss)(flow.f))

    scale = float(np.abs(grads[False]).max())
    np.testing.assert_allclose(grads[True], grads[False],
                               atol=1e-12 * scale)


def test_sharded_adjoint_kbc_split_f64():
    """KBC's entropic stabiliser has no closed-form jacobian fragment:
    the sharded backward runs the SPLIT adjoint per shard — the
    ("none",)-spec streaming-transpose kernel plus a pointwise
    ``collide_local`` vjp — with the same transposed edge exchange."""
    grads = {}
    for use_native in (False, True):
        ctx = lt.Context(dtype=jnp.float64, use_native=use_native)
        flow = lt.TaylorGreenVortex(ctx, [64, 128], 100, 0.05,
                                    stencil=lt.D2Q9(),
                                    initialize_fneq=False)
        decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
        sim = lt.Simulation(flow, lt.KBCCollision(
            flow.units.relaxation_parameter_lu), [],
            decomposition=decomp)
        if use_native:
            assert getattr(sim._step, "adjoint_kernel", False)
            assert getattr(sim._step, "adjoint_mode", None) == "split"
        step = sim.make_step_fn()

        def loss(f, step=step, view=flow.view):
            for _ in range(2):
                f = step(f)
            return jnp.sum(view(f).incompressible_energy())

        grads[use_native] = np.asarray(jax.grad(loss)(flow.f))

    scale = float(np.abs(grads[False]).max())
    np.testing.assert_allclose(grads[True], grads[False],
                               atol=1e-12 * scale)


def test_sharded_adjoint_smagorinsky_f64():
    """Smagorinsky's per-cell tau_eff(f) adjoint is pointwise, so it
    shards transparently: the per-shard adjoint kernel computes the
    relaxation-derivative term from local f."""
    grads = {}
    for use_native in (False, True):
        ctx = lt.Context(dtype=jnp.float64, use_native=use_native)
        flow = lt.TaylorGreenVortex(ctx, [64, 16, 128], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=True)
        decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
        sim = lt.Simulation(flow, lt.SmagorinskyCollision(0.8), [],
                            decomposition=decomp)
        if use_native:
            assert getattr(sim._step, "adjoint_kernel", False)
        step = sim.make_step_fn()

        def loss(f, step=step, view=flow.view):
            for _ in range(2):
                f = step(f)
            return jnp.sum(view(f).incompressible_energy())

        grads[use_native] = np.asarray(jax.grad(loss)(flow.f))

    scale = float(np.abs(grads[False]).max())
    np.testing.assert_allclose(grads[True], grads[False],
                               atol=1e-11 * scale)


def test_sharded_adjoint_per_node_inlet_f64():
    """A per-node equilibrium inlet under sharding: constant in f, so its
    masked nodes zero in the kernel adjoint while the edge-plane vjp
    composes the same combined-feq replacement."""
    rng = np.random.RandomState(5)
    vel = rng.rand(3, 64, 16, 128) * 0.05
    grads = {}
    for use_native in (False, True):
        ctx = lt.Context(dtype=jnp.float64, use_native=use_native)
        mask = np.zeros((64, 16, 128), dtype=bool)
        mask[:, 0, :] = True
        flow = TestFlow(ctx, resolution=[64, 16, 128], stencil=lt.D3Q19(),
                        boundaries=[lt.EquilibriumBoundaryPU(
                            ctx, mask, vel, 0.001)])
        decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
        sim = lt.Simulation(flow, lt.BGKCollision(0.85), [],
                            decomposition=decomp)
        if use_native:
            assert getattr(sim._step, "adjoint_kernel", False)
        step = sim.make_step_fn()

        def loss(f, step=step, view=flow.view):
            for _ in range(2):
                f = step(f)
            return jnp.sum(view(f).incompressible_energy())

        grads[use_native] = np.asarray(jax.grad(loss)(flow.f))

    scale = float(np.abs(grads[False]).max())
    np.testing.assert_allclose(grads[True], grads[False],
                               atol=1e-12 * scale)


def test_step_path_introspection():
    """The public Simulation.step_path property reports the selected
    path (kernel kind, sharding, temporal-blocking depth)."""
    ctx = lt.Context(dtype=jnp.float64, use_native=False)
    flow = _tgv(ctx)
    sim = lt.Simulation(flow, lt.BGKCollision(
        flow.units.relaxation_parameter_lu), [])
    assert sim.step_path == "jnp x1"

    flow = _tgv(ctx)
    decomp = lt.DomainDecomposition(mesh_shape=(8,))
    sim = lt.Simulation(flow, lt.BGKCollision(
        flow.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim.step_path.startswith("sharded(")


def test_sharded_sponge_outlet_padded_face_axis_falls_back():
    """A SpongeOutlet whose face axis is a PADDED axis cannot ride the
    padded sharded kernel (its per-plane sigma field has the true face
    extent and cannot broadcast on the padded edge-plane slab) — the
    build must fall back to the jnp sharded path instead of crashing at
    trace time."""
    from tests.conftest import TestFlow
    ctx = lt.Context(dtype=jnp.float32, use_native=True)
    flow = TestFlow(ctx, resolution=[64, 16, 96], stencil=lt.D3Q19())
    flow._boundaries = [lt.SpongeOutlet([0, 0, 1], flow, depth=4)]
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim = lt.Simulation(flow, lt.BGKCollision(0.8), [],
                        decomposition=decomp)
    assert sim._step.step_path == "jnp"
    sim(1)
    assert np.all(np.isfinite(np.asarray(flow.f)))


def test_sharded_2dmesh_native_step_differentiable():
    """No native path may break jax.grad (VERDICT r3 item 3): the 2D-mesh
    kernel step carries a custom_vjp whose backward is the sharded jnp
    twin, so autodiff works and matches the jnp path."""
    grads = {}
    for use_native in (False, True):
        ctx = lt.Context(dtype=jnp.float32, use_native=use_native)
        flow = lt.TaylorGreenVortex(ctx, [16, 64, 128], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)
        decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
        sim = lt.Simulation(flow, lt.BGKCollision(
            flow.units.relaxation_parameter_lu), [], decomposition=decomp)
        if use_native:
            assert sim._step.step_path == "pallas"
        step = sim.make_step_fn()

        def loss(f, step=step, view=flow.view):
            for _ in range(2):
                f = step(f)
            return jnp.sum(view(f).incompressible_energy())

        grads[use_native] = np.asarray(jax.grad(loss)(flow.f))

    assert np.all(np.isfinite(grads[True]))
    assert float(np.abs(grads[True]).max()) > 0
    np.testing.assert_allclose(grads[True], grads[False], atol=1e-5)


def test_sharded_2dmesh_2dgrid_step_differentiable():
    """Same universal-differentiability guarantee for 2D grids on 2D
    meshes (lane-aligned y-halo path)."""
    grads = {}
    for use_native in (False, True):
        ctx = lt.Context(dtype=jnp.float32, use_native=use_native)
        flow = lt.TaylorGreenVortex(ctx, [32, 512], 100, 0.05,
                                    stencil=lt.D2Q9(),
                                    initialize_fneq=False)
        decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
        sim = lt.Simulation(flow, lt.BGKCollision(
            flow.units.relaxation_parameter_lu), [], decomposition=decomp)
        if use_native:
            assert sim._step.step_path == "pallas"
        step = sim.make_step_fn()

        def loss(f, step=step, view=flow.view):
            f = step(f)
            return jnp.sum(view(f).incompressible_energy())

        grads[use_native] = np.asarray(jax.grad(loss)(flow.f))

    assert np.all(np.isfinite(grads[True]))
    assert float(np.abs(grads[True]).max()) > 0
    np.testing.assert_allclose(grads[True], grads[False], atol=1e-5)


def test_sharded_2dmesh_padded_step_differentiable():
    """2D-mesh kernel with a ghost-image padded minor axis: the vjp twin
    pads/unpads around the sharded jnp step."""
    grads = {}
    for use_native in (False, True):
        ctx = lt.Context(dtype=jnp.float32, use_native=use_native)
        flow = lt.TaylorGreenVortex(ctx, [16, 64, 96], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)
        decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
        sim = lt.Simulation(flow, lt.BGKCollision(
            flow.units.relaxation_parameter_lu), [], decomposition=decomp)
        if use_native:
            assert sim._step.step_path == "pallas"
            assert sim._step.pad_codec is not None
        step = sim.make_step_fn()

        def loss(f, step=step, view=flow.view):
            f = step(f)
            return jnp.sum(view(f).incompressible_energy())

        grads[use_native] = np.asarray(jax.grad(loss)(flow.f))

    assert np.all(np.isfinite(grads[True]))
    assert float(np.abs(grads[True]).max()) > 0
    np.testing.assert_allclose(grads[True], grads[False], atol=1e-5)


def _make_obstacle(ctx, res=(64, 256), dlx=3.2):
    flow = lt.Obstacle(ctx, list(res), reynolds_number=50,
                       mach_number=0.05, domain_length_x=dlx)
    grids = [np.asarray(g) for g in flow.grid]
    x, y = grids[0], grids[1]
    cx = dlx / 2
    cy = float(y.max()) / 2
    flow.mask = (x - cx) ** 2 + (y - cy) ** 2 < (0.12 * dlx) ** 2
    return flow


def test_sharded_outlet_on_sharded_face_axis_jnp(ctx64):
    """The outlet's pointwise/roll formulation is exact even when its
    face axis IS the sharded axis: it only writes the global face plane,
    whose inward-neighbour read stays shard-local (VERDICT r3 item 2 —
    the reference obstacle case sharded along the flow direction)."""
    flow_ref = _make_obstacle(ctx64)
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [])
    sim_ref(8)

    flow_sh = _make_obstacle(ctx64)
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim_sh._step.step_path == "jnp"
    sim_sh(8)

    np.testing.assert_array_equal(np.asarray(flow_sh.f),
                                  np.asarray(flow_ref.f))


def test_sharded_hybrid_outlet_on_sharded_face_axis_native():
    """Outlet face axis == the sharded axis on the 1D kernel path: the
    kernel freezes the outlet planes and a GLOBAL window replay (outside
    shard_map; the window wraps across shards) rewrites them exactly."""
    ctx = lt.Context(dtype=jnp.float32, use_native=True)
    flow_ref = _make_obstacle(ctx)
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [])
    assert sim_ref._step_kind == "pallas"
    sim_ref(8)

    flow_sh = _make_obstacle(ctx)
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim_sh._step.step_path == "pallas+hybrid"
    sim_sh(8)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=1e-6)


def test_sharded_2dmesh_hybrid_outlet():
    """VERDICT r3 item 2: the reference's flagship open-boundary case
    (obstacle.py:16-125) under a 2D device mesh rides the fused kernel —
    inlet + outlet + bounce-back mask, outlet face axis sharded."""
    ctx = lt.Context(dtype=jnp.float32, use_native=True)
    flow_ref = _make_obstacle(ctx, res=(32, 512))
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [])
    assert sim_ref._step_kind == "pallas"
    sim_ref(8)

    flow_sh = _make_obstacle(ctx, res=(32, 512))
    decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim_sh._step.step_path == "pallas+hybrid"
    sim_sh(8)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=1e-6)


def test_sharded_2dmesh_hybrid_outlet_grad():
    """jax.grad through the 2D-mesh hybrid step (jnp-twin backward)."""
    grads = {}
    for use_native in (False, True):
        ctx = lt.Context(dtype=jnp.float32, use_native=use_native)
        flow = _make_obstacle(ctx, res=(32, 512))
        decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
        sim = lt.Simulation(flow, lt.BGKCollision(
            flow.units.relaxation_parameter_lu), [], decomposition=decomp)
        if use_native:
            assert sim._step.step_path == "pallas+hybrid"
        step = sim.make_step_fn()

        def loss(f, step=step, view=flow.view):
            f = step(f)
            return jnp.sum(view(f).incompressible_energy())

        grads[use_native] = np.asarray(jax.grad(loss)(flow.f))

    assert np.all(np.isfinite(grads[True]))
    np.testing.assert_allclose(grads[True], grads[False], atol=1e-5)


def test_sharded_temporal_blocking_hybrid_outlet(monkeypatch):
    """Temporal blocking under 1D sharding keeps outlet flows on the
    kernel (VERDICT r3 item 2): the blocked launch freezes the outlet
    planes for n_sub sub-steps and the global n_sub-step window replay
    rewrites the contamination cone exactly."""
    monkeypatch.setenv("LETTUCE_NSUB", "2")
    ctx = lt.Context(dtype=jnp.float32, use_native=True)
    flow_sh = _make_obstacle(ctx)
    decomp = lt.DomainDecomposition(mesh_shape=(8,), grid_axes=(0,))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim_sh._step_multi is not None and sim_sh._step_multi[1] == 2
    sim_sh(8)

    monkeypatch.delenv("LETTUCE_NSUB")
    flow_ref = _make_obstacle(ctx)
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [])
    sim_ref(8)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), atol=1e-6)


def test_sharded_2dmesh_2dgrid_unaligned_minor():
    """The 2D-grid 2D-mesh 128-lane cliff is gone (VERDICT r3 item 2c):
    a local minor extent that is NOT a multiple of 128 rides the kernel
    via alignment halos — the two y-halo depths are chosen so the
    extended minor extent is lane-aligned."""
    def make(native):
        ctx = lt.Context(dtype=jnp.float64, use_native=native)
        return lt.TaylorGreenVortex(ctx, [32, 320], 100, 0.05,
                                    stencil=lt.D2Q9(),
                                    initialize_fneq=False)

    flow_ref = make(False)
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [])
    sim_ref(5)

    flow_sh = make(True)
    decomp = lt.DomainDecomposition(mesh_shape=(2, 4))  # ly = 80
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim_sh._step.step_path == "pallas"
    sim_sh(5)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)


def test_sharded_2dmesh_2dgrid_unaligned_grad():
    """...and stays differentiable through the 2D-mesh adjoint kernel."""
    grads = {}
    for use_native in (False, True):
        ctx = lt.Context(dtype=jnp.float64, use_native=use_native)
        flow = lt.TaylorGreenVortex(ctx, [32, 320], 100, 0.05,
                                    stencil=lt.D2Q9(),
                                    initialize_fneq=False)
        decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
        sim = lt.Simulation(flow, lt.BGKCollision(
            flow.units.relaxation_parameter_lu), [], decomposition=decomp)
        if use_native:
            assert sim._step.step_path == "pallas"
            assert getattr(sim._step, "adjoint_kernel", False)
        step = sim.make_step_fn()

        def loss(f, step=step, view=flow.view):
            f = step(f)
            return jnp.sum(view(f).incompressible_energy())

        grads[use_native] = np.asarray(jax.grad(loss)(flow.f))

    scale = float(np.abs(grads[False]).max())
    np.testing.assert_allclose(grads[True], grads[False],
                               atol=1e-12 * scale)


def test_sharded_2dmesh_2dgrid_unaligned_blocked(monkeypatch):
    """Temporal blocking composes with the alignment halos."""
    monkeypatch.setenv("LETTUCE_NSUB", "2")

    def make(native):
        ctx = lt.Context(dtype=jnp.float64, use_native=native)
        return lt.TaylorGreenVortex(ctx, [32, 320], 100, 0.05,
                                    stencil=lt.D2Q9(),
                                    initialize_fneq=False)

    flow_sh = make(True)
    decomp = lt.DomainDecomposition(mesh_shape=(2, 4))
    sim_sh = lt.Simulation(flow_sh, lt.BGKCollision(
        flow_sh.units.relaxation_parameter_lu), [], decomposition=decomp)
    assert sim_sh._step_multi is not None and sim_sh._step_multi[1] == 2
    sim_sh(4)

    monkeypatch.delenv("LETTUCE_NSUB")
    flow_ref = make(False)
    sim_ref = lt.Simulation(flow_ref, lt.BGKCollision(
        flow_ref.units.relaxation_parameter_lu), [])
    sim_ref(4)

    np.testing.assert_allclose(np.asarray(flow_sh.f),
                               np.asarray(flow_ref.f), rtol=0, atol=1e-13)
