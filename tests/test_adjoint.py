"""Adjoint-kernel vs jax-autodiff equivalence.

``build_fused_step`` backs its ``custom_vjp`` with a dedicated adjoint
Pallas kernel (``ops/pallas/adjoint.py``) for BGK/NoCollision
configurations: the exact vector-Jacobian product of one fused
collide-and-stream step in one memory-bound pass. The oracle is
``jax.vjp`` of the mathematically identical jnp step — the same
native-vs-reference pattern as ``tests/test_native.py``, applied to the
backward pass. All cases assert the adjoint kernel actually engaged
(``step.adjoint_kernel``), so a silent fallback to the jnp vjp cannot
masquerade as a pass.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lettuce_tpu as lt

# compile-heavy: adjoint-kernel vs jax.vjp equivalence — excluded from the fast tier (-m "not slow")
pytestmark = pytest.mark.slow
from tests.conftest import TestFlow


def _ctx(dtype="float64"):
    return lt.Context(device="cpu", dtype=dtype, use_native=True)


def _grad_both(flow, collision, steps=3, expect_adjoint=True, mode=None):
    """Gradient of a rollout loss through the kernel step (adjoint
    kernel backward) and through the jnp step (jax autodiff)."""
    sim = lt.Simulation(flow, collision, [])
    assert sim._step_kind == "pallas"
    assert getattr(sim._step, "adjoint_kernel", None) is expect_adjoint
    if mode is not None:
        assert getattr(sim._step, "adjoint_mode", None) == mode
    jnp_step = sim._build_jnp_step()
    kernel_step = sim.make_step_fn()  # pad-codec-aware public step

    def loss(f, step):
        for _ in range(steps):
            f = step(f)
        return jnp.sum(flow.view(f).incompressible_energy())

    g_kernel = jax.grad(lambda f: loss(f, kernel_step))(flow.f)
    g_jnp = jax.grad(lambda f: loss(f, jnp_step))(flow.f)
    return np.asarray(g_kernel), np.asarray(g_jnp)


def _assert_close(g_kernel, g_jnp, rtol):
    assert np.all(np.isfinite(g_kernel))
    assert float(np.abs(g_kernel).max()) > 0
    scale = float(np.abs(g_jnp).max())
    np.testing.assert_allclose(g_kernel, g_jnp, atol=rtol * scale)


def test_adjoint_bgk_periodic_2d_f64():
    flow = lt.TaylorGreenVortex(_ctx(), [16, 128], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    g_k, g_j = _grad_both(
        flow, lt.BGKCollision(flow.units.relaxation_parameter_lu))
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_bgk_periodic_3d_f64():
    flow = lt.TaylorGreenVortex(_ctx(), [8, 16, 128], 100, 0.05,
                                stencil=lt.D3Q19(), initialize_fneq=False)
    g_k, g_j = _grad_both(
        flow, lt.BGKCollision(flow.units.relaxation_parameter_lu))
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_bgk_periodic_2d_f32():
    flow = lt.TaylorGreenVortex(_ctx("float32"), [16, 128], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    g_k, g_j = _grad_both(
        flow, lt.BGKCollision(flow.units.relaxation_parameter_lu))
    _assert_close(g_k, g_j, 1e-5)


def test_adjoint_masked_walls_and_lid():
    """Bounce-back walls + moving-lid equilibrium boundary: the transposed
    boundary jacobians (opposite re-route / zero) select per mask code."""
    flow = lt.Cavity2D(_ctx(), [16, 128], 100, 0.05)
    g_k, g_j = _grad_both(
        flow, lt.BGKCollision(flow.units.relaxation_parameter_lu))
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_masked_3d():
    mask = np.zeros((8, 16, 128), dtype=bool)
    mask[:, 0, :] = True
    ctx = _ctx()
    flow = TestFlow(ctx, resolution=[8, 16, 128], stencil=lt.D3Q19(),
                    boundaries=[lt.BounceBackBoundary(mask)])
    g_k, g_j = _grad_both(flow, lt.BGKCollision(0.8))
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_no_streaming_mask():
    """Frozen populations re-route the cotangent to their own node (the
    statically pre-shifted nsm pair)."""
    class FrozenBoundary(lt.BounceBackBoundary):
        def make_no_streaming_mask(self, shape, context):
            m = np.zeros(tuple(shape), dtype=bool)
            m[:, 8, :] = True
            return context.convert_to_tensor(m)

    mask = np.zeros((16, 128), dtype=bool)
    mask[0, :] = True
    ctx = _ctx()
    flow = TestFlow(ctx, resolution=[16, 128], stencil=lt.D2Q9(),
                    boundaries=[FrozenBoundary(mask)])
    g_k, g_j = _grad_both(flow, lt.BGKCollision(0.8))
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_per_node_equilibrium_boundary():
    """Per-node inlet (combined feq field): constant in f, so its adjoint
    zeroes the masked nodes."""
    mask = np.zeros((16, 128), dtype=bool)
    mask[0, :] = True
    rng = np.random.RandomState(3)
    vel = rng.rand(2, 16, 128) * 0.05
    ctx = _ctx()
    flow = TestFlow(ctx, resolution=[16, 128], stencil=lt.D2Q9(),
                    boundaries=[lt.EquilibriumBoundaryPU(
                        ctx, mask, vel, 0.001)])
    g_k, g_j = _grad_both(flow, lt.BGKCollision(0.85))
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_no_collision():
    """NoCollision: the adjoint is the pure streaming transpose."""
    flow = lt.TaylorGreenVortex(_ctx(), [16, 128], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    g_k, g_j = _grad_both(flow, lt.NoCollision())
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_disabled_env(monkeypatch):
    """LETTUCE_ADJOINT=0 forces the jnp-vjp backward; gradients still
    match (A/B benchmarking escape hatch)."""
    monkeypatch.setenv("LETTUCE_ADJOINT", "0")
    flow = lt.TaylorGreenVortex(_ctx(), [16, 128], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    g_k, g_j = _grad_both(
        flow, lt.BGKCollision(flow.units.relaxation_parameter_lu),
        expect_adjoint=False)
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_trt():
    """TRT's relaxation matrix is symmetric (O commutes with itself), so
    its adjoint shares the BGK kernel via t = M h."""
    flow = lt.TaylorGreenVortex(_ctx(), [16, 128], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    tau = flow.units.relaxation_parameter_lu
    g_k, g_j = _grad_both(flow, lt.TRTCollision(tau, tau * 1.3))
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_trt_3d_masked():
    mask = np.zeros((8, 16, 128), dtype=bool)
    mask[:, 0, :] = True
    ctx = _ctx()
    flow = TestFlow(ctx, resolution=[8, 16, 128], stencil=lt.D3Q19(),
                    boundaries=[lt.BounceBackBoundary(mask)])
    g_k, g_j = _grad_both(flow, lt.TRTCollision(0.8, 0.95))
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_mrt_dhumieres():
    """Folded MRT f' = f - C (f - feq) is f-linear: the adjoint applies
    the transposed static matvec C^T plus the shared quadratic
    equilibrium-jacobian moments."""
    flow = lt.TaylorGreenVortex(_ctx(), [8, 16, 128], 100, 0.05,
                                stencil=lt.D3Q19(), initialize_fneq=False)
    transform = lt.D3Q19DHumieres(flow.stencil, flow.context)
    taus = [1.0, 1.2, 1.1, 1.0, 1.3, 1.0, 1.3, 1.0, 1.3,
            0.9, 1.1, 0.9, 1.1, 0.9, 0.9, 0.9, 1.2, 1.2, 1.2]
    g_k, g_j = _grad_both(
        flow, lt.MRTCollision(transform, taus, flow.context))
    _assert_close(g_k, g_j, 1e-11)


def test_adjoint_mrt_analytic_meq_split():
    """Analytic-moment MRT relaxes toward meq(rho, j) — a different
    equilibrium jacobian with no closed-form fragment; it takes the
    SPLIT adjoint (streaming transpose in-kernel + pointwise vjp)."""
    flow = lt.TaylorGreenVortex(_ctx(), [16, 128], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    transform = lt.D2Q9Lallemand(flow.stencil, flow.context)
    g_k, g_j = _grad_both(
        flow, lt.MRTCollision(transform, [1.1] * 9, flow.context),
        mode="split")
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_regularized_2d():
    """Regularized collision is f-linear through the static Q projection:
    C = I - (1 - 1/tau) P transposes like the folded MRT."""
    flow = lt.TaylorGreenVortex(_ctx(), [16, 128], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    g_k, g_j = _grad_both(flow, lt.RegularizedCollision(0.8))
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_regularized_3d_masked():
    mask = np.zeros((8, 16, 128), dtype=bool)
    mask[:, 0, :] = True
    ctx = _ctx()
    flow = TestFlow(ctx, resolution=[8, 16, 128], stencil=lt.D3Q19(),
                    boundaries=[lt.BounceBackBoundary(mask)])
    g_k, g_j = _grad_both(flow, lt.RegularizedCollision(0.8))
    _assert_close(g_k, g_j, 1e-11)


def test_adjoint_split_kbc_2d():
    """KBC's entropic stabiliser has no closed-form jacobian fragment;
    the SPLIT adjoint transposes the streaming in-kernel and applies the
    pointwise collision jacobian via jax.vjp of the pre-streaming map."""
    flow = lt.TaylorGreenVortex(_ctx(), [16, 128], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    g_k, g_j = _grad_both(flow, lt.KBCCollision(
        flow.units.relaxation_parameter_lu), mode="split")
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_split_kbc_3d():
    flow = lt.TaylorGreenVortex(_ctx(), [8, 8, 128], 100, 0.05,
                                stencil=lt.D3Q27(), initialize_fneq=False)
    g_k, g_j = _grad_both(flow, lt.KBCCollision(
        flow.units.relaxation_parameter_lu), steps=2, mode="split")
    _assert_close(g_k, g_j, 1e-11)


def test_adjoint_split_guo_force():
    """Velocity-dependent forcing makes the collision jacobian depend on
    the Guo source term: covered by the split adjoint's pointwise vjp."""
    flow = lt.TaylorGreenVortex(_ctx(), [16, 128], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    force = lt.Guo(flow, tau=0.8, acceleration=[1e-4, 0.0])
    g_k, g_j = _grad_both(flow, lt.BGKCollision(0.8, force=force),
                          mode="split")
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_split_kbc_masked():
    """Split adjoint + bounce-back boundary routing (carried by the
    pointwise map's vjp). The state is perturbed off equilibrium: AT
    exact equilibrium KBC's safe-division guard makes the jacobian a
    subgradient choice that is sensitive to roundoff-level trajectory
    differences between the kernel and jnp forwards."""
    mask = np.zeros((16, 128), dtype=bool)
    mask[0, :] = True
    ctx = _ctx()
    flow = TestFlow(ctx, resolution=[16, 128], stencil=lt.D2Q9(),
                    boundaries=[lt.BounceBackBoundary(mask)])
    rng = np.random.RandomState(0)
    flow.f = flow.f * (1.0 + 0.01 * jnp.asarray(rng.rand(*flow.f.shape)))
    g_k, g_j = _grad_both(flow, lt.KBCCollision(0.8), mode="split")
    _assert_close(g_k, g_j, 1e-11)


def test_adjoint_split_kbc_padded():
    """Split adjoint composes with ghost-image padding: the in-kernel
    minor fold commutes with the pointwise jacobian transpose (image
    cells replicate their sources' physics)."""
    flow = lt.TaylorGreenVortex(_ctx(), [16, 100], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    g_k, g_j = _grad_both(flow, lt.KBCCollision(
        flow.units.relaxation_parameter_lu), steps=2, mode="split")
    _assert_close(g_k, g_j, 1e-11)


def test_adjoint_smagorinsky_2d():
    """Smagorinsky's per-cell tau_eff(f) differentiates in-kernel: the
    BGK-shaped transpose with per-cell t = s h plus the relaxation
    derivative term D s^2 (dtau/dR) dR/df."""
    flow = lt.TaylorGreenVortex(_ctx(), [16, 128], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    tau = flow.units.relaxation_parameter_lu
    g_k, g_j = _grad_both(flow, lt.SmagorinskyCollision(tau))
    _assert_close(g_k, g_j, 1e-11)


def test_adjoint_smagorinsky_3d_masked():
    mask = np.zeros((8, 16, 128), dtype=bool)
    mask[:, 0, :] = True
    ctx = _ctx()
    flow = TestFlow(ctx, resolution=[8, 16, 128], stencil=lt.D3Q19(),
                    boundaries=[lt.BounceBackBoundary(mask)])
    g_k, g_j = _grad_both(flow, lt.SmagorinskyCollision(0.8))
    _assert_close(g_k, g_j, 1e-11)


def test_adjoint_smagorinsky_padded():
    """Smagorinsky adjoint composes with ghost-image padding."""
    flow = lt.TaylorGreenVortex(_ctx(), [16, 100], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    tau = flow.units.relaxation_parameter_lu
    g_k, g_j = _grad_both(flow, lt.SmagorinskyCollision(tau))
    _assert_close(g_k, g_j, 1e-11)


def test_adjoint_padded_minor_image_2d():
    """Ghost-image padding (minor 100 -> 128, image mode) composes with
    the adjoint kernel: the step transpose is zero_pad . fold . K_p^T .
    zero_pad . fold — boundary dependencies ride the input image bands."""
    flow = lt.TaylorGreenVortex(_ctx(), [16, 100], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    g_k, g_j = _grad_both(
        flow, lt.BGKCollision(flow.units.relaxation_parameter_lu))
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_padded_tile_mode_2d():
    """Tile-mode minor padding (64 -> 128, a full periodic copy): the
    fold transpose sums the copies' cotangents."""
    flow = lt.TaylorGreenVortex(_ctx(), [16, 64], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    g_k, g_j = _grad_both(
        flow, lt.BGKCollision(flow.units.relaxation_parameter_lu))
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_padded_leading_axis_3d():
    """3D grid padded on BOTH the y axis (leading, jnp refresh in the
    forward) and the minor axis: fold must transpose the sequential
    takes in reverse axis order (corners)."""
    flow = lt.TaylorGreenVortex(_ctx(), [8, 17, 100], 100, 0.05,
                                stencil=lt.D3Q19(), initialize_fneq=False)
    g_k, g_j = _grad_both(
        flow, lt.BGKCollision(flow.units.relaxation_parameter_lu))
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_padded_masked_walls():
    """Padded grid + mask-coded boundaries: the padded masks carry image
    semantics, so ghost-band adjoint contributions match the true wrap."""
    flow = lt.Cavity2D(_ctx(), [16, 100], 100, 0.05)
    g_k, g_j = _grad_both(
        flow, lt.BGKCollision(flow.units.relaxation_parameter_lu))
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_padded_frozen_populations():
    """Padded grid + no-streaming mask: the adjoint's statically
    pre-shifted nsm pair shifts at the PADDED extent, matching the padded
    forward kernel's pull semantics."""
    class FrozenBoundary(lt.BounceBackBoundary):
        def make_no_streaming_mask(self, shape, context):
            m = np.zeros(tuple(shape), dtype=bool)
            m[:, 8] = True
            return context.convert_to_tensor(m)

    mask = np.zeros((16, 100), dtype=bool)
    mask[0, :] = True
    ctx = _ctx()
    flow = TestFlow(ctx, resolution=[16, 100], stencil=lt.D2Q9(),
                    boundaries=[FrozenBoundary(mask)])
    g_k, g_j = _grad_both(flow, lt.BGKCollision(0.8))
    _assert_close(g_k, g_j, 1e-12)


def test_adjoint_hybrid_outlet_padded():
    """Hybrid outlet fix-up + ghost-image padding + adjoint kernel, all
    composed: the fix-up vjp splits the cotangent (window replay vs
    pass-through), the adjoint kernel transposes the padded kernel-as-run
    with in-VMEM minor fold."""
    ctx = _ctx()
    flow = lt.Obstacle(ctx, [32, 100], reynolds_number=80,
                       mach_number=0.1, domain_length_x=3.2)

    class FlowWithOutlet(lt.Obstacle):
        @property
        def boundaries(self):
            inlet, _, bb = lt.Obstacle.boundaries.fget(self)
            return [inlet, lt.AntiBounceBackOutlet([1, 0], self), bb]

    flow.__class__ = FlowWithOutlet
    x, y = flow.grid
    flow.mask = np.asarray((x - 1.0) ** 2 + (y - 5.0) ** 2 < 0.3)
    flow.initialize()
    sim = lt.Simulation(
        flow, lt.BGKCollision(flow.units.relaxation_parameter_lu), [])
    assert sim._step_kind == "pallas"
    assert sim._step.pad_codec is not None
    assert sim._step.adjoint_kernel
    step = sim.make_step_fn()

    ctx_j = lt.Context(dtype=jnp.float64, use_native=False)
    flow_j = lt.Obstacle(ctx_j, [32, 100], reynolds_number=80,
                         mach_number=0.1, domain_length_x=3.2)
    flow_j.__class__ = FlowWithOutlet
    flow_j.mask = flow.mask
    flow_j.initialize()
    sim_j = lt.Simulation(
        flow_j, lt.BGKCollision(flow_j.units.relaxation_parameter_lu), [])

    def loss(f, s, view):
        for _ in range(3):
            f = s(f)
        return jnp.sum(view(f).u() ** 2)

    g_n = np.asarray(jax.grad(
        lambda f: loss(f, step, flow.view))(flow.f))
    g_j = np.asarray(jax.grad(
        lambda f: loss(f, sim_j.make_step_fn(), flow_j.view))(flow_j.f))
    scale = float(np.abs(g_j).max())
    np.testing.assert_allclose(g_n, g_j, atol=1e-12 * scale)


def test_adjoint_segment_fn_padded():
    """make_segment_fn scans the padded step with the codec applied once
    per segment; its gradient matches the per-step public chain (whose
    codec custom-vjp folds with slice adds instead of scatter)."""
    flow = lt.TaylorGreenVortex(_ctx(), [16, 100], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    sim = lt.Simulation(
        flow, lt.BGKCollision(flow.units.relaxation_parameter_lu), [])
    assert sim._step.adjoint_kernel
    seg = sim.make_segment_fn(3)
    step = sim.make_step_fn()

    def loss_seg(f):
        return jnp.sum(flow.view(seg(f)).incompressible_energy())

    def loss_step(f):
        for _ in range(3):
            f = step(f)
        return jnp.sum(flow.view(f).incompressible_energy())

    g1 = jax.grad(loss_seg)(flow.f)
    g2 = jax.grad(loss_step)(flow.f)
    _assert_close(np.asarray(g1), np.asarray(g2), 1e-12)


def test_adjoint_padded_mrt_matvec():
    """Padded grid + folded-MRT matvec adjoint compose."""
    flow = lt.TaylorGreenVortex(_ctx(), [8, 16, 100], 100, 0.05,
                                stencil=lt.D3Q19(), initialize_fneq=False)
    transform = lt.D3Q19DHumieres(flow.stencil, flow.context)
    taus = [1.0, 1.2, 1.1, 1.0, 1.3, 1.0, 1.3, 1.0, 1.3,
            0.9, 1.1, 0.9, 1.1, 0.9, 0.9, 0.9, 1.2, 1.2, 1.2]
    g_k, g_j = _grad_both(
        flow, lt.MRTCollision(transform, taus, flow.context))
    _assert_close(g_k, g_j, 1e-11)


def test_adjoint_checkpointed_segment():
    """make_segment_fn(checkpoint_every=k) rematerialises the rollout in
    k-step jax.checkpoint chunks (VERDICT r3 item 7): the gradient equals
    the unsegmented form exactly (recomputation is bitwise), while the
    backward stores one state per chunk instead of one residual per step."""
    flow = lt.TaylorGreenVortex(_ctx(), [16, 128], 100, 0.05,
                                stencil=lt.D2Q9(), initialize_fneq=False)
    sim = lt.Simulation(
        flow, lt.BGKCollision(flow.units.relaxation_parameter_lu), [])
    assert sim._step.adjoint_kernel
    plain = sim.make_segment_fn(7)
    ckpt = sim.make_segment_fn(7, checkpoint_every=3)  # 2 chunks + 1 rem

    def loss(seg):
        return lambda f: jnp.sum(flow.view(seg(f)).incompressible_energy())

    g1 = np.asarray(jax.grad(loss(plain))(flow.f))
    g2 = np.asarray(jax.grad(loss(ckpt))(flow.f))
    assert np.all(np.isfinite(g2))
    _assert_close(g2, g1, 1e-12)


# ---------------------------------------------------------------------------
# Temporally-blocked adjoint (fused_adjoint_multi): the backward of n_sub
# fused sub-steps in one recompute-in-block pass
# ---------------------------------------------------------------------------

def _grad_blocked_vs_jnp(collision_of, stencil, res, n_sub, steps):
    """Gradient of a rollout through make_segment_fn with the blocked
    differentiable kernel vs the jnp path."""
    def make(native):
        ctx = lt.Context(device="cpu", dtype="float64", use_native=native)
        flow = lt.TaylorGreenVortex(ctx, res, 100, 0.05, stencil=stencil,
                                    initialize_fneq=False)
        sim = lt.Simulation(flow, collision_of(flow), [])
        return flow, sim

    import os
    os.environ["LETTUCE_NSUB"] = str(n_sub)
    try:
        flow, sim = make(True)
        assert sim._step_multi is not None
        assert getattr(sim._step_multi[0], "adjoint_kernel", False)
        seg = sim.make_segment_fn(steps)
        g_k = jax.grad(lambda f: jnp.sum(seg(f) ** 2))(flow.f)
    finally:
        os.environ.pop("LETTUCE_NSUB", None)
    flow2, sim2 = make(False)
    seg2 = sim2.make_segment_fn(steps)
    g_j = jax.grad(lambda f: jnp.sum(seg2(f) ** 2))(flow2.f)
    _assert_close(np.asarray(g_k), np.asarray(g_j), 1e-11)


def test_adjoint_blocked_bgk_3d():
    _grad_blocked_vs_jnp(
        lambda fl: lt.BGKCollision(fl.units.relaxation_parameter_lu),
        lt.D3Q19(), [16, 16, 128], n_sub=2, steps=5)


def test_adjoint_blocked_bgk_2d_deep():
    _grad_blocked_vs_jnp(
        lambda fl: lt.BGKCollision(fl.units.relaxation_parameter_lu),
        lt.D2Q9(), [32, 256], n_sub=4, steps=9)


def test_adjoint_blocked_trt():
    _grad_blocked_vs_jnp(lambda fl: lt.TRTCollision(0.8, 1.1),
                         lt.D3Q19(), [16, 16, 128], n_sub=2, steps=4)


def test_adjoint_blocked_mrt_folded():
    def col(fl):
        tr = lt.D3Q19DHumieres(fl.stencil, fl.context)
        return lt.MRTCollision(tr, [0.8] * fl.stencil.q, fl.context)
    _grad_blocked_vs_jnp(col, lt.D3Q19(), [16, 16, 128], n_sub=2, steps=4)


def test_adjoint_blocked_checkpointed():
    """jax.checkpoint composes with the blocked custom_vjp segments."""
    import os
    os.environ["LETTUCE_NSUB"] = "2"
    try:
        ctx = lt.Context(device="cpu", dtype="float64", use_native=True)
        flow = lt.TaylorGreenVortex(ctx, [16, 16, 128], 100, 0.05,
                                    stencil=lt.D3Q19(),
                                    initialize_fneq=False)
        sim = lt.Simulation(flow, lt.BGKCollision(
            flow.units.relaxation_parameter_lu), [])
        seg = sim.make_segment_fn(8, checkpoint_every=4)
        g1 = jax.grad(lambda f: jnp.sum(seg(f) ** 2))(flow.f)
        seg_plain = sim.make_segment_fn(8)
        g2 = jax.grad(lambda f: jnp.sum(seg_plain(f) ** 2))(flow.f)
    finally:
        os.environ.pop("LETTUCE_NSUB", None)
    _assert_close(np.asarray(g1), np.asarray(g2), 1e-12)


def test_adjoint_blocked_masked_falls_back():
    """Masked configurations keep the single-step adjoint path (the
    blocked custom_vjp is gated to periodic configurations)."""
    ctx = lt.Context(device="cpu", dtype="float64", use_native=True)
    flow = lt.CouetteFlow2D(ctx, 16, 100, 0.05)
    import os
    os.environ["LETTUCE_NSUB"] = "2"
    try:
        sim = lt.Simulation(flow, lt.BGKCollision(
            flow.units.relaxation_parameter_lu), [])
        if sim._step_multi is not None:
            assert not getattr(sim._step_multi[0], "adjoint_kernel", False)
    finally:
        os.environ.pop("LETTUCE_NSUB", None)
