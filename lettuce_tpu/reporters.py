"""Observables and reporters.

Parity with ``/root/reference/lettuce/ext/_reporter/``: the ``Observable``
family (MaximumVelocity, IncompressibleKineticEnergy, Enstrophy,
EnergySpectrum, Mass), ``ObservableReporter``, ``ErrorReporter``, and
``VTKReporter`` (via the dependency-free writer in ``utils/vtk.py``).

Observables are pure device computations; only the reporter boundary moves
data to the host (one scalar/vector per interval).
"""

from __future__ import annotations

import os
import sys
from abc import ABC, abstractmethod
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .flow import Flow
from .simulation import Reporter
from .utils.utility import jax_gradient

__all__ = ["Observable", "MaximumVelocity", "IncompressibleKineticEnergy",
           "Enstrophy", "EnergySpectrum", "Mass", "DragCoefficient",
           "ObservableReporter",
           "ErrorReporter", "VTKReporter", "FlowStatistics", "NaNGuard",
           "write_image", "mean_analytic_error"]


class Observable(ABC):
    def __init__(self, flow: "Flow"):
        self.context = flow.context
        self.flow = flow

    @abstractmethod
    def __call__(self, f: Optional[jax.Array] = None):
        ...


class MaximumVelocity(Observable):
    """Maximum velocity magnitude in physical units."""

    def __call__(self, f: Optional[jax.Array] = None):
        flow = self.flow if f is None else self.flow.view(f)
        return jnp.max(jnp.linalg.norm(flow.u_pu, axis=0))


class IncompressibleKineticEnergy(Observable):
    """Total kinetic energy of an incompressible flow (physical units)."""

    def __call__(self, f: Optional[jax.Array] = None):
        flow = self.flow if f is None else self.flow.view(f)
        dx = flow.units.convert_length_to_pu(1.0)
        kin_e = flow.units.convert_incompressible_energy_to_pu(
            jnp.sum(flow.incompressible_energy()))
        return kin_e * dx ** flow.stencil.d


class Enstrophy(Observable):
    """Integral of squared vorticity (6th-order FD; periodic domains
    only)."""

    def __call__(self, f: Optional[jax.Array] = None):
        flow = self.flow if f is None else self.flow.view(f)
        u = flow.units.convert_velocity_to_pu(flow.u())
        dx = flow.units.convert_length_to_pu(1.0)
        grad_u0 = jax_gradient(u[0], dx=dx, order=6)
        grad_u1 = jax_gradient(u[1], dx=dx, order=6)
        vorticity = jnp.sum((grad_u0[1] - grad_u1[0]) ** 2)
        if flow.stencil.d == 3:
            grad_u2 = jax_gradient(u[2], dx=dx, order=6)
            vorticity += jnp.sum((grad_u2[1] - grad_u1[2]) ** 2
                                 + (grad_u0[2] - grad_u2[0]) ** 2)
        return vorticity * dx ** flow.stencil.d


class EnergySpectrum(Observable):
    """Shell-binned kinetic energy spectrum via FFT."""

    def __init__(self, flow: "Flow"):
        super().__init__(flow)
        self.dx = flow.units.convert_length_to_pu(1.0)
        self.dimensions = flow.resolution
        frequencies = [np.fft.fftfreq(dim, d=1 / dim)
                       for dim in self.dimensions]
        wavenumbers = np.stack(np.meshgrid(*frequencies, indexing="ij"))
        wavenorms = np.linalg.norm(wavenumbers, axis=0)

        if flow.stencil.d == 3:
            self.norm = self.dimensions[0] * np.sqrt(2 * np.pi) / self.dx ** 2
        else:
            self.norm = self.dimensions[0] / self.dx

        self.wavenumbers = np.arange(int(np.max(wavenorms)))
        self.wavemask = jnp.asarray(
            (wavenorms[..., None] > self.wavenumbers - 0.5)
            & (wavenorms[..., None] <= self.wavenumbers + 0.5))

    def __call__(self, f: Optional[jax.Array] = None):
        flow = self.flow if f is None else self.flow.view(f)
        return self.spectrum_from_u(flow.u())

    def spectrum_from_u(self, u):
        u = self.flow.units.convert_velocity_to_pu(u)
        d = self.flow.stencil.d
        uh = jnp.stack([jnp.fft.fftn(u[i], axes=tuple(range(d)))
                        for i in range(d)]) / self.norm
        ekin = jnp.sum(0.5 * (uh.imag ** 2 + uh.real ** 2), axis=0)
        ek = ekin[..., None] * self.wavemask.astype(ekin.dtype)
        return ek.sum(axis=tuple(range(d)))


class DragCoefficient(Observable):
    """Drag and lift coefficients on a solid (bounce-back) mask via the
    momentum-exchange method (Ladd 1994): every fluid-to-solid link
    contributes ``e_q (f_q + f_qbar)`` to the force on the body.

    NEW capability (the reference has no force observable). Returns the
    ``[d]`` coefficient vector ``2 F / (rho0 u_char^2 A)`` — component 0
    is C_D, the rest are lift coefficients. ``area_lu`` defaults to
    ``characteristic_length_lu^(d-1)`` (the diameter in 2D). Link masks
    are pointwise rolls of the static solid mask, so the observable works
    under ``jit``, in ``rollout()``, and on sharded state.
    """

    def __init__(self, flow: "Flow", solid_mask, area_lu=None):
        super().__init__(flow)
        d = flow.stencil.d
        if area_lu is None:
            area_lu = float(flow.units.characteristic_length_lu) ** (d - 1)
        self.area_lu = float(area_lu)
        solid = np.asarray(solid_mask, dtype=bool)
        e = np.asarray(flow.stencil.e)
        links = [np.roll(solid, tuple(-e[qi]), axis=tuple(range(d)))
                 & ~solid for qi in range(flow.stencil.q)]
        self.link_masks = jnp.asarray(np.stack(links))
        self._e = jnp.asarray(e, dtype=flow.context.dtype)
        self._opposite = np.asarray(flow.stencil.opposite)

    def __call__(self, f: Optional[jax.Array] = None):
        f = self.flow.f if f is None else f
        exchange = (f + f[self._opposite]) * self.link_masks.astype(f.dtype)
        per_q = exchange.reshape(exchange.shape[0], -1).sum(axis=1)
        force_lu = per_q @ self._e.astype(per_q.dtype)  # [d]
        u_char = self.flow.units.characteristic_velocity_lu
        rho0 = self.flow.units.characteristic_density_lu
        return 2.0 * force_lu / (rho0 * u_char ** 2 * self.area_lu)


class Mass(Observable):
    """Total mass in lattice units, optionally excluding masked nodes."""

    def __init__(self, flow: "Flow", no_mass_mask=None):
        super().__init__(flow)
        self.mask = no_mass_mask

    def __call__(self, f: Optional[jax.Array] = None):
        f = self.flow.f if f is None else f
        # reference trims one cell from the LAST TWO axes only
        # (mass.py: f[..., 1:-1, 1:-1]), regardless of dimension
        mass = f[..., 1:-1, 1:-1].sum()
        if self.mask is not None:
            mass -= (f * self.mask.astype(f.dtype)).sum()
        return mass


class ObservableReporter(Reporter):
    """Prints/accumulates ``[step, t_pu, observable...]`` every ``interval``
    steps (reference ``observable_reporter.py:161-199``)."""

    def __init__(self, observable: "Observable", interval=1, out=sys.stdout):
        super().__init__(interval)
        self.observable = observable
        self.out = [] if out is None else out
        self._parameter_name = observable.__class__.__name__
        print('steps    ', 'time    ', self._parameter_name)

    def __call__(self, simulation: "Simulation"):
        if simulation.flow.i % self.interval == 0:
            observed = np.asarray(self.observable(simulation.flow.f))
            assert observed.ndim < 2
            if observed.ndim == 0:
                observed = [observed.item()]
            else:
                observed = observed.tolist()
            entry = ([simulation.flow.i,
                      simulation.units.convert_time_to_pu(simulation.flow.i)]
                     + observed)
            if isinstance(self.out, list):
                self.out.append(entry)
            else:
                print(*entry, file=self.out)


class ErrorReporter(Reporter):
    """Resolution-normalised L2 errors of u and p against an analytic
    solution (reference ``error_reporter.py:9-42``)."""

    def __init__(self, analytical_solution, interval=1, out=sys.stdout):
        super().__init__(interval)
        self.analytical_solution = analytical_solution
        self.out = [] if out is None else out
        if not isinstance(self.out, list):
            print("#error_u         error_p", file=self.out)

    def __call__(self, simulation: "Simulation"):
        flow = simulation.flow
        i = flow.i
        t = simulation.units.convert_time_to_pu(i)

        if i % self.interval == 0:
            pref, uref = self.analytical_solution(t=t)
            pref = flow.context.convert_to_tensor(pref)
            uref = flow.context.convert_to_tensor(uref)
            p = flow.p_pu
            u = flow.u_pu

            resolution = float(np.prod(np.asarray(p.shape))
                               ) ** (1 / flow.stencil.d)

            err_u = (jnp.linalg.norm(u - uref)
                     / resolution ** (flow.stencil.d / 2))
            err_p = (jnp.linalg.norm(p - pref)
                     / resolution ** (flow.stencil.d / 2))

            if isinstance(self.out, list):
                self.out.append([float(err_u), float(err_p)])
            else:
                print(float(err_u), float(err_p), file=self.out)


def mean_analytic_error(simulation, num_steps: int):
    """Mean per-step L2 errors of (u, p) against the flow's analytic
    solution over ``num_steps`` steps — ``ErrorReporter(interval=1)`` with
    the whole run fused into one on-device ``lax.scan``.

    This reproduces the reference's convergence-gate measurement
    (``/root/reference/lettuce/cli.py:146-163``: per-step errors at
    interval=1, mean of their absolute values including the initial state)
    without ``num_steps`` host round-trips. Requires the flow's
    ``analytic_solution`` to be jnp-traceable in ``t`` (TGV 2D is).

    Returns ``(err_u, err_p)`` floats; the flow state advances as with a
    normal call.
    """
    flow = simulation.flow
    units = flow.units
    d = flow.stencil.d
    # reference norm: prod(p.shape)^(1/d) ** (d/2) == sqrt(prod(p.shape))
    denom = float(np.sqrt(np.prod([1] + list(flow.resolution))))

    def errs_at(f, i):
        t = units.convert_time_to_pu(i)
        pref, uref = flow.analytic_solution(t=t)
        view = flow.view(f)
        err_u = jnp.linalg.norm(view.u_pu - uref) / denom
        err_p = jnp.linalg.norm(view.p_pu - pref) / denom
        return jnp.stack([err_u, err_p])

    step = simulation.make_step_fn()

    def body(f, i):
        f = step(f)
        return f, errs_at(f, i)

    i0 = int(flow.i)

    @jax.jit
    def run(f):
        e0 = errs_at(f, jnp.asarray(i0, dtype=jnp.int32))
        steps = i0 + 1 + jnp.arange(num_steps, dtype=jnp.int32)
        f, errs = jax.lax.scan(body, f, steps)
        return f, jnp.concatenate([e0[None, :], errs], axis=0)

    flow.f, errs = run(flow.f)
    flow.i += num_steps
    err_u, err_p = np.abs(np.asarray(errs)).mean(axis=0).tolist()
    return err_u, err_p


class FlowStatistics(Reporter):
    """Running first- and second-moment statistics of the velocity field.

    NEW capability (the reference computes time averages manually in its
    notebooks): every ``interval`` steps the reporter accumulates
    ``sum u`` and ``sum u u^T`` as device arrays — no host transfer until
    the properties are read. After a statistically steady run,

      * ``mean_u``          — time-averaged velocity [d, *grid] (pu),
      * ``reynolds_stresses`` — <u'_a u'_b> [d, d, *grid] (pu),
      * ``turbulent_kinetic_energy`` — 0.5 trace of the stresses.

    ``reset()`` discards the accumulators (e.g. after the transient).
    """

    def __init__(self, flow: "Flow", interval: int = 1):
        super().__init__(interval)
        self.flow = flow
        self.reset()

    def reset(self):
        self._n = 0
        self._sum_u = None
        self._sum_uu = None

    def __call__(self, simulation: "Simulation"):
        if simulation.flow.i % self.interval != 0:
            return
        u = simulation.flow.u_pu
        uu = u[:, None] * u[None, :]
        if self._sum_u is None:
            self._sum_u, self._sum_uu = u, uu
        else:
            self._sum_u = self._sum_u + u
            self._sum_uu = self._sum_uu + uu
        self._n += 1

    @property
    def mean_u(self):
        assert self._n, "no samples accumulated yet"
        return self._sum_u / self._n

    @property
    def reynolds_stresses(self):
        assert self._n, "no samples accumulated yet"
        m = self.mean_u
        return self._sum_uu / self._n - m[:, None] * m[None, :]

    @property
    def turbulent_kinetic_energy(self):
        r = self.reynolds_stresses
        return 0.5 * jnp.einsum("aa...->...", r)


class NaNGuard(Reporter):
    """Failure detection: raise ``FloatingPointError`` as soon as the
    state goes non-finite (checked every ``interval`` steps).

    The reference's only numerical fault tolerance is KBC's NaN guard on
    its stabiliser; an exploding BGK run there silently produces NaN
    fields. One device-side reduction per interval; on divergence the
    error names the first failing step window so the run can be resumed
    from the last checkpoint with safer parameters.
    """

    def __init__(self, flow: "Flow", interval: int = 100):
        super().__init__(interval)
        self.flow = flow

    def __call__(self, simulation: "Simulation"):
        if simulation.flow.i % self.interval != 0:
            return
        if not bool(jnp.isfinite(simulation.flow.f).all()):
            raise FloatingPointError(
                f"non-finite populations detected at step "
                f"{simulation.flow.i} (within the last {self.interval} "
                f"steps) — the simulation has diverged; lower Ma / "
                f"refine the grid / use a stabilised collision "
                f"(KBC, regularized, Smagorinsky)")


class VTKReporter(Reporter):
    """Writes VTK structured grids of p and velocity components per
    interval, using the dependency-free writer in ``utils/vtk.py``."""

    def __init__(self, interval=50, filename_base="./data/output"):
        super().__init__(interval)
        self.filename_base = filename_base
        directory = os.path.dirname(filename_base)
        if directory and not os.path.isdir(directory):
            os.makedirs(directory, exist_ok=True)
        self.point_dict = dict()

    def __call__(self, simulation: "Simulation"):
        from .utils.vtk import write_vtk
        flow = simulation.flow
        if flow.i % self.interval == 0:
            u = flow.u_pu
            p = flow.p_pu
            if flow.stencil.d == 2:
                self.point_dict["p"] = np.asarray(p[0, ..., None])
                for d in range(flow.stencil.d):
                    self.point_dict[f"u{'xyz'[d]}"] = np.asarray(
                        u[d, ..., None])
            else:
                self.point_dict["p"] = np.asarray(p[0, ...])
                for d in range(flow.stencil.d):
                    self.point_dict[f"u{'xyz'[d]}"] = np.asarray(u[d, ...])
            write_vtk(self.point_dict, flow.i, self.filename_base)

    def output_mask(self, simulation: "Simulation"):
        """Write the no_collision_mask as a VTK file with range [0, 1]."""
        from .utils.vtk import write_vtk
        point_dict = dict()
        m = np.asarray(simulation.no_collision_mask).astype(np.int32)
        if simulation.flow.stencil.d == 2:
            m = m[..., None]
        point_dict["mask"] = m
        write_vtk(point_dict, filename_base=self.filename_base + "_mask",
                  suffix="")


def write_image(filename, array2d):
    """PNG dump of a 2D field (reference ``write_image.py:4-14``)."""
    from matplotlib import pyplot as plt
    fig, ax = plt.subplots()
    plt.tight_layout()
    ax.imshow(np.asarray(array2d))
    ax.set_xlabel('')
    ax.set_ylabel('')
    ax.get_xaxis().set_visible(False)
    ax.get_yaxis().set_visible(False)
    plt.savefig(filename)
    plt.close(fig)
