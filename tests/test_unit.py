"""Unit-conversion invariants (reference tests/unit/)."""

import numpy as np
import pytest

import lettuce_tpu as lt


@pytest.fixture
def units():
    return lt.UnitConversion(reynolds_number=1600, mach_number=0.05,
                             characteristic_length_pu=2 * np.pi,
                             characteristic_length_lu=64,
                             characteristic_velocity_pu=2.5,
                             characteristic_density_pu=0.9)


CONVERSIONS = ["velocity", "time", "length", "density", "pressure",
               "acceleration", "energy", "incompressible_energy"]


@pytest.mark.parametrize("quantity", CONVERSIONS)
def test_conversion_reversible(units, quantity):
    value = 1.357
    to_lu = getattr(units, f"convert_{quantity}_to_lu")
    to_pu = getattr(units, f"convert_{quantity}_to_pu")
    assert np.isclose(to_pu(to_lu(value)), value)
    assert np.isclose(to_lu(to_pu(value)), value)


def test_pressure_density_roundtrip(units):
    p = 0.0123
    rho = units.convert_pressure_pu_to_density_lu(p)
    assert np.isclose(units.convert_density_lu_to_pressure_pu(rho), p)


def test_reynolds_number_consistent(units):
    re_lu = (units.characteristic_velocity_lu
             * units.characteristic_length_lu / units.viscosity_lu)
    re_pu = (units.characteristic_velocity_pu
             * units.characteristic_length_pu / units.viscosity_pu)
    assert np.isclose(re_lu, units.reynolds_number)
    assert np.isclose(re_pu, units.reynolds_number)


def test_relaxation_parameter(units):
    tau = units.relaxation_parameter_lu
    assert tau > 0.5
    assert np.isclose((tau - 0.5) * units.cs ** 2, units.viscosity_lu)


def test_consistency(units):
    rho = 2.7
    u = 1.337
    energy_derived = units.convert_density_to_pu(
        rho) * units.convert_velocity_to_pu(u) ** 2
    energy_direct = units.convert_energy_to_pu(rho * u * u)
    assert np.isclose(energy_derived, energy_direct)
