"""Shared numerical utilities.

Parity with reference ``lettuce/util/utility.py``: periodic finite-difference
gradients (orders 2/4/6, Fornberg weights), a Jacobi Poisson solver, the
multigrid restriction ``grid_fine_to_coarse``, ``append_axes`` and the
exception/warning taxonomy.

TPU-first notes: ``jax_jacobi`` runs its iteration inside
``jax.lax.while_loop`` (single compiled loop, no host sync per sweep) instead
of the reference's Python ``while`` (``utility.py:119-156``).
"""

from __future__ import annotations

import inspect as _inspect

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["get_subclasses", "LettuceException", "LettuceWarning",
           "InefficientCodeWarning", "ExperimentalWarning",
           "jax_gradient", "torch_gradient", "grid_fine_to_coarse",
           "jax_jacobi", "torch_jacobi", "append_axes"]


def get_subclasses(cls, module):
    for _, obj in _inspect.getmembers(module):
        if hasattr(obj, "__bases__") and cls in obj.__bases__:
            yield obj


class LettuceException(Exception):
    pass


class LettuceWarning(UserWarning):
    pass


class InefficientCodeWarning(LettuceWarning):
    pass


class ExperimentalWarning(LettuceWarning):
    pass


# Fornberg (1988) central-difference weights for the first derivative.
_FD_WEIGHTS = {
    2: ((1, -1 / 2), (-1, 1 / 2)),
    4: ((2, 1 / 12), (1, -2 / 3), (-1, 2 / 3), (-2, -1 / 12)),
    6: ((3, -1 / 60), (2, 3 / 20), (1, -3 / 4),
        (-1, 3 / 4), (-2, -3 / 20), (-3, 1 / 60)),
}


def jax_gradient(f: jax.Array, dx=1, order: int = 2) -> jax.Array:
    """First derivative of a periodic scalar field along every axis.

    Returns shape ``[ndim, *f.shape]``. Orders O(h^2), O(h^4), O(h^6)
    (reference ``utility.py:37-99``). Works for any ndim (the reference
    supports 2D/3D only).
    """
    if order not in _FD_WEIGHTS:
        raise LettuceException(f"Unsupported FD order {order}")
    taps = _FD_WEIGHTS[order]
    components = []
    for axis in range(f.ndim):
        acc = jnp.zeros_like(f)
        for shift, weight in taps:
            # roll(+s) brings f(x - s) to x: tap (s, w) contributes w*f(x-s)
            acc = acc + weight * jnp.roll(f, shift, axis=axis)
        components.append(acc / dx)
    return jnp.stack(components)


# parity alias for scripts ported from the reference
torch_gradient = jax_gradient


def grid_fine_to_coarse(flow: "Flow", f_fine, tau_fine, tau_coarse):
    """Multigrid restriction: stride-2 subsample and rescale f_neq by the
    tau ratio (reference ``utility.py:102-116``)."""
    d = f_fine.ndim - 1
    if d not in (2, 3):
        raise LettuceException("Invalid dimension!")
    sub = (slice(None),) + (slice(None, None, 2),) * d
    f_sub = f_fine[sub]
    f_eq = flow.equilibrium(flow, rho=flow.rho(f_sub), u=flow.u(f_sub))
    f_neq = f_sub - f_eq
    return f_eq + 2 * tau_coarse / tau_fine * f_neq


def _laplacian_neighbors(p: jax.Array, dim: int) -> jax.Array:
    acc = jnp.zeros_like(p)
    for axis in range(dim):
        acc = acc + jnp.roll(p, 1, axis=axis) + jnp.roll(p, -1, axis=axis)
    return acc


def jax_jacobi(f, p, dx, dim, tol_abs=1e-10, max_num_steps=100000):
    """Jacobi solver for the Poisson equation ``lap p = f`` on a periodic
    grid, iterating until the mean squared residual drops below ``tol_abs``
    (reference ``utility.py:119-156``), as one compiled ``while_loop``."""
    dx2 = dx * dx
    n_nb = 2 * dim

    def residual(p):
        return f - (_laplacian_neighbors(p, dim) - n_nb * p) / dx2

    def cond(carry):
        p, err, it = carry
        return jnp.logical_and(err > tol_abs, it < max_num_steps)

    def body(carry):
        p, _, it = carry
        p = -(f * dx2 - _laplacian_neighbors(p, dim)) / n_nb
        err = jnp.mean(residual(p) ** 2)
        return p, err, it + 1

    p, _, _ = jax.lax.while_loop(
        cond, body, (p, jnp.asarray(jnp.inf, dtype=p.dtype),
                     jnp.asarray(0, dtype=jnp.int32)))
    return p


torch_jacobi = jax_jacobi


def append_axes(array, n: int):
    array = jnp.asarray(array)
    return array.reshape(array.shape + (1,) * n)


def install_init_recorder(cls) -> None:
    """Wrap ``cls.__init__`` so instances record their constructor
    arguments as ``self._init_record = (cls, {name: value})``.

    Installed from ``__init_subclass__`` on :class:`~..flow.Flow` and
    :class:`~..ops.collision.Collision` — the record is what
    ``HDF5Reporter`` persists and ``LettuceDataset.make_flow`` /
    ``make_collision`` rebuild from, the role the reference fills by
    pickling live objects into HDF5 attrs
    (``/root/reference/lettuce/util/datautils.py:112-133``). Only the
    OUTERMOST constructor records (a subclass ``__init__`` runs before it
    chains to ``super()``), so the record always matches ``type(self)``'s
    own signature.
    """
    init = cls.__dict__.get("__init__")
    if init is None:
        return
    import functools

    sig = _inspect.signature(init)

    @functools.wraps(init)
    def recording_init(self, *args, **kw):
        if not hasattr(self, "_init_record"):
            try:
                bound = sig.bind(self, *args, **kw)
                bound.apply_defaults()
                rec = dict(bound.arguments)
                rec.pop("self", None)
                kw_var = next((p.name for p in sig.parameters.values()
                               if p.kind == p.VAR_KEYWORD), None)
                if kw_var is not None:
                    rec.update(rec.pop(kw_var, {}) or {})
                self._init_record = (cls, rec)
            except TypeError:
                self._init_record = (cls, None)
        init(self, *args, **kw)

    cls.__init__ = recording_init


def chunked_jnp_step(simulation, n_chunks: int = 8):
    """A memory-lean twin of the pure-jnp reference step: computes one
    collide-and-stream step in ``n_chunks`` x-slabs with one wrapped
    halo plane each, so the peak footprint is O(q * X/n_chunks * rest)
    instead of the full-grid jnp path's many per-q roll intermediates.

    Purpose: an OOM-proof ORACLE for kernel-vs-jnp equivalence at grid
    sizes where the plain jnp step overflows HBM (KBC D3Q27 at 256^3
    needs ~30 q-sized intermediates; see docs/performance.md). Only
    periodic mask-free configurations — exactly the configurations the
    large-grid equivalence tests run. Pointwise collisions only (every
    collision operator is pointwise in f; this excludes nothing).

    Returns ``step(f) -> f_next`` mathematically identical to
    ``Simulation._build_jnp_step()`` (checked in
    ``tests/test_native.py::test_chunked_oracle_matches_jnp``).
    """
    if simulation.no_collision_mask is not None \
            or simulation.no_streaming_mask is not None:
        raise NotImplementedError("chunked oracle covers the periodic "
                                  "mask-free configurations")
    flow = simulation.flow
    collision = simulation.collision
    e = np.asarray(flow.stencil.e)
    X = int(flow.resolution[0])
    n_chunks = max(1, min(int(n_chunks), X))
    while X % n_chunks != 0:
        n_chunks -= 1
    cx = X // n_chunks

    def step(f):
        outs = []
        for c in range(n_chunks):
            a = c * cx
            idx = jnp.arange(a - 1, a + cx + 1) % X
            fc = f[:, idx]
            fc = collision(flow.view(fc))
            # pull streaming inside the extended chunk; x pulls stay in
            # range because of the halo plane, other axes wrap fully
            q = e.shape[0]
            rolled = [
                jnp.roll(fc[qi], shift=tuple(int(s) for s in e[qi][1:]),
                         axis=tuple(range(1, e.shape[1])))
                if e.shape[1] > 1 else fc[qi]
                for qi in range(q)]
            out = jnp.stack([
                jax.lax.dynamic_slice_in_dim(
                    rolled[qi], 1 - int(e[qi][0]), cx, axis=0)
                for qi in range(q)])
            outs.append(out)
        return jnp.concatenate(outs, axis=1)

    return step
