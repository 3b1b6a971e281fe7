"""Decaying isotropic turbulence in 2D/3D.

Parity with reference ``/root/reference/lettuce/ext/_flows/
decayingturbulence.py:23-189``: random-phase velocity field shaped to the
spectrum ``k^4 exp(-2 (k/k0)^2)``, divergence removal with modified
wavenumbers (matching 2nd-order central differences), energy rescale to
``ic_energy``; optional pressure-Poisson and f_neq initialisation.

The spectrum construction runs once on the host in numpy float64 (identical
to the reference), then the field moves to device.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..stencil import D1Q3, D2Q9, D3Q19
from ..unit import UnitConversion
from ._ext_flow import ExtFlow

__all__ = ["DecayingTurbulence"]


class DecayingTurbulence(ExtFlow):

    def __init__(self, context: "Context", resolution: Union[int, List[int]],
                 reynolds_number, mach_number, k0=20, ic_energy=0.5,
                 stencil: Optional["Stencil"] = None,
                 equilibrium: Optional["Equilibrium"] = None,
                 initialize_pressure: bool = True,
                 initialize_fneq: bool = True,
                 randseed: Optional[int] = None):
        self.initialize_pressure = initialize_pressure
        self.initialize_fneq = initialize_fneq
        self.randseed = randseed
        self.k0 = k0
        self.ic_energy = ic_energy
        self.wavenumbers = []
        self.spectrum = []
        default_stencils = [D1Q3(), D2Q9(), D3Q19()]
        stencil = stencil or default_stencils[len(resolution) - 1]
        stencil = stencil() if callable(stencil) else stencil
        if stencil.d != 2:
            self.initialize_pressure = False
        super().__init__(context, resolution, reynolds_number, mach_number,
                         stencil, equilibrium)

    def make_resolution(self, resolution: Union[int, List[int]],
                        stencil: Optional["Stencil"] = None) -> List[int]:
        if isinstance(resolution, int):
            return [resolution] * stencil.d
        return resolution

    def make_units(self, reynolds_number, mach_number,
                   resolution) -> "UnitConversion":
        return UnitConversion(
            reynolds_number=reynolds_number,
            mach_number=mach_number,
            characteristic_length_lu=resolution[0],
            characteristic_length_pu=2 * np.pi,
            characteristic_velocity_pu=None)

    def analytic_solution(self, x, t=0):
        return

    def _generate_wavenumbers(self):
        self.dimensions = tuple(self.resolution)
        frequencies = [np.fft.fftfreq(dim, d=1 / dim)
                       for dim in self.dimensions]
        # NOTE: the reference uses meshgrid's default 'xy' indexing
        # (decayingturbulence.py:75), which pairs k_x with grid axis 1 and
        # makes the IC divergence-free only under swapped axes. 'ij' gives
        # the natural pairing; statistics are identical on square grids.
        wavenumber = np.meshgrid(*frequencies, indexing="ij")
        wavenorms = np.linalg.norm(wavenumber, axis=0)
        self.wavenumbers = np.arange(int(np.max(wavenorms)))
        wavemask = ((wavenorms[..., None] > self.wavenumbers - 0.5)
                    & (wavenorms[..., None] <= self.wavenumbers + 0.5))
        return wavenorms, wavenumber, wavemask

    def _generate_spectrum(self):
        wavenorms, wavenumber, wavemask = self._generate_wavenumbers()
        ek = wavenorms ** 4 * np.exp(-2 * (wavenorms / self.k0) ** 2)
        ek /= np.sum(ek)
        ek *= self.ic_energy
        self.spectrum = ek[..., None] * wavemask
        self.spectrum = np.sum(self.spectrum,
                               axis=tuple(np.arange(self.stencil.d)))
        return ek, wavenumber

    def _generate_initial_velocity(self, ek, wavenumber):
        d = self.stencil.d
        dx = self.units.convert_length_to_pu(1.0)
        rng = np.random.RandomState(self.randseed)
        u = rng.random_sample(np.array(wavenumber).shape) * 2 * np.pi + 0j
        u = [np.fft.fftn(u[dim], axes=tuple(np.arange(d)))
             for dim in range(d)]

        u_real = [u[dim].real for dim in range(d)]
        u_imag = [u[dim].imag for dim in range(d)]
        for dim in range(d):
            u_real[dim].ravel()[0] = 0
            u_imag[dim].ravel()[0] = 0

        # shape the random phases to the target spectrum
        amp = [np.sqrt(2 / d * ek
                       / (u_imag[dim] ** 2 + u_real[dim] ** 2 + 1.e-15))
               for dim in range(d)]
        u_real_h = [amp[dim] * u_real[dim] for dim in range(d)]
        u_imag_h = [amp[dim] * u_imag[dim] for dim in range(d)]
        for dim in range(d):
            u_real_h[dim].ravel()[0] = 0
            u_imag_h[dim].ravel()[0] = 0

        # remove divergence using the modified wavenumber sin(k dx)/dx of
        # 2nd-order central differences
        wavenumber_modified = [np.sin(wavenumber[dim] * dx) / dx
                               for dim in range(d)]
        wavenorm_modified = (np.linalg.norm(wavenumber_modified, axis=0)
                             + 1e-16)

        divergence_real = np.zeros(self.dimensions)
        divergence_imag = np.zeros(self.dimensions)
        for dim in range(d):
            divergence_real += wavenumber_modified[dim] * u_real_h[dim]
            divergence_imag += wavenumber_modified[dim] * u_imag_h[dim]

        u_real = [u_real_h[dim] - divergence_real * wavenumber_modified[dim]
                  / wavenorm_modified ** 2 for dim in range(d)]
        u_imag = [u_imag_h[dim] - divergence_imag * wavenumber_modified[dim]
                  / wavenorm_modified ** 2 for dim in range(d)]
        for dim in range(d):
            u_real[dim].ravel()[0] = 0
            u_imag[dim].ravel()[0] = 0

        # rescale to the desired initial energy
        e_kin = np.sum([np.sum(u_real[dim] ** 2 + u_imag[dim] ** 2)
                        for dim in range(d)]) * 0.5
        factor = np.sqrt(self.ic_energy / e_kin)
        u_real = [u_real[dim] * factor for dim in range(d)]
        u_imag = [u_imag[dim] * factor for dim in range(d)]

        norm = ((self.resolution[0] * dx ** (1 - d)
                 * np.sqrt(self.units.characteristic_length_pu))
                if d == 3 else (self.resolution[0] / dx))

        u = np.asarray([
            (np.fft.ifftn(u_real[dim] + u_imag[dim] * 1.0j,
                          axes=tuple(np.arange(d))) * norm).real
            for dim in range(d)])
        return u

    def _compute_initial_pressure(self):
        return np.zeros(self.dimensions)[None, ...]

    def initial_pu(self):
        """Note: sets the characteristic velocity in physical units from the
        generated field, like the reference."""
        ek, wavenumber = self._generate_spectrum()
        u = self._generate_initial_velocity(ek, wavenumber)
        p = self._compute_initial_pressure()
        self.units.characteristic_velocity_pu = np.linalg.norm(u, axis=0).max()
        return p, u

    @property
    def energy_spectrum(self):
        return self.spectrum, self.wavenumbers

    @property
    def grid(self):
        xyz = tuple(
            jnp.linspace(0, 2 * np.pi * (1 - 1 / n), n,
                         dtype=self.context.dtype)
            for n in self.resolution)
        return jnp.meshgrid(*xyz, indexing="ij")

    @property
    def boundaries(self) -> List["Boundary"]:
        return []
