"""Reporter / observable / I-O tests (reference tests/reporter/)."""

import os

import numpy as np
import pytest

import lettuce_tpu as lt


@pytest.fixture
def tgv_sim(fix_context):
    flow = lt.TaylorGreenVortex(fix_context, 16, 100, 0.05,
                                stencil=lt.D2Q9())
    collision = lt.BGKCollision(tau=flow.units.relaxation_parameter_lu)
    return flow, collision


@pytest.mark.parametrize("observable_cls", [
    lt.MaximumVelocity, lt.IncompressibleKineticEnergy, lt.Enstrophy,
    lt.Mass])
def test_observable_stable_over_steps(tgv_sim, observable_cls):
    flow, collision = tgv_sim
    obs = observable_cls(flow)
    reporter = lt.ObservableReporter(obs, interval=1, out=[])
    sim = lt.Simulation(flow, collision, [reporter])
    sim(2)
    values = np.asarray(reporter.out)
    assert values.shape[0] == 3  # step 0, 1, 2
    assert np.all(np.isfinite(values))
    # smooth flow: observable changes slowly
    assert abs(values[-1, 2] - values[0, 2]) < 0.2 * (abs(values[0, 2])
                                                      + 1e-10)


def test_energy_spectrum_shape(tgv_sim):
    flow, _ = tgv_sim
    spectrum = lt.EnergySpectrum(flow)(flow.f)
    assert spectrum.ndim == 1
    assert np.all(np.isfinite(np.asarray(spectrum)))


def test_energy_spectrum_total_matches_energy(fix_context):
    """Parseval: the spectrum integrates to the total kinetic energy."""
    flow = lt.DecayingTurbulence(fix_context, [32, 32], 1600, 0.05, k0=8,
                                 randseed=0)
    spectrum = np.asarray(lt.EnergySpectrum(flow)(flow.f))
    energy = float(np.asarray(
        lt.IncompressibleKineticEnergy(flow)(flow.f)))
    assert np.isclose(spectrum.sum(), energy, rtol=0.1)


def test_vtk_reporter_writes_files(tmp_path, tgv_sim):
    flow, collision = tgv_sim
    base = os.path.join(tmp_path, "out")
    reporter = lt.VTKReporter(interval=1, filename_base=base)
    sim = lt.Simulation(flow, collision, [reporter])
    sim(2)
    files = [f for f in os.listdir(tmp_path) if f.endswith(".vtk")]
    assert len(files) == 3
    with open(os.path.join(tmp_path, files[0]), "rb") as fh:
        head = fh.read(100)
    assert head.startswith(b"# vtk DataFile")


def test_vtk_mask_output(tmp_path, fix_context):
    flow = lt.CouetteFlow2D(fix_context, 8, 10, 0.05)
    sim = lt.Simulation(flow, lt.BGKCollision(0.8), [])
    rep = lt.VTKReporter(interval=1,
                         filename_base=os.path.join(tmp_path, "m"))
    rep.output_mask(sim)
    assert os.path.exists(os.path.join(tmp_path, "m_mask.vtk"))


def test_hdf5_roundtrip(tmp_path, tgv_sim):
    """HDF5 write -> read -> training pairs (reference
    test_HDF5Reporter.py:5-31)."""
    flow, collision = tgv_sim
    base = os.path.join(tmp_path, "data")
    reporter = lt.HDF5Reporter(flow, collision, interval=2, filebase=base)
    sim = lt.Simulation(flow, collision, [reporter])
    sim(4)
    reporter.close()

    ds = lt.LettuceDataset(base, target=True, skip_idx_to_target=1)
    assert len(ds) == 2  # 3 snapshots -> 2 pairs
    f0, f1, idx = ds[0]
    assert f0.shape == tuple([flow.stencil.q] + flow.resolution)
    assert np.all(np.isfinite(f0)) and np.all(np.isfinite(f1))
    assert ds.metadata["stencil"] == "D2Q9"
    ds.close()


def test_write_image(tmp_path, tgv_sim):
    flow, _ = tgv_sim
    fname = os.path.join(tmp_path, "u.png")
    lt.write_image(fname, np.asarray(flow.u_pu)[0])
    assert os.path.exists(fname)


def test_error_reporter_decreasing_resolution_error(fix_context):
    flow = lt.TaylorGreenVortex(fix_context, 16, 100, 0.05,
                                stencil=lt.D2Q9())
    out = []
    rep = lt.ErrorReporter(flow.analytic_solution, interval=1, out=out)
    sim = lt.Simulation(
        flow, lt.BGKCollision(flow.units.relaxation_parameter_lu), [rep])
    sim(3)
    errors = np.asarray(out)
    assert np.all(np.isfinite(errors))
    assert errors[:, 0].max() < 0.05  # small error for resolved TGV


def test_rollout_on_device_observables(fix_context):
    """Simulation.rollout gathers observables inside one jitted scan and
    matches the per-step reporter values."""
    def make():
        return lt.TaylorGreenVortex(fix_context, 16, 100, 0.05,
                                    stencil=lt.D2Q9())

    flow_a = make()
    sim_a = lt.Simulation(
        flow_a, lt.BGKCollision(flow_a.units.relaxation_parameter_lu), [])
    records = sim_a.rollout(6, observables=[
        lt.IncompressibleKineticEnergy(flow_a),
        lt.MaximumVelocity(flow_a)], interval=2)
    assert records.shape == (3, 2)
    assert flow_a.i == 6

    flow_b = make()
    rep = lt.ObservableReporter(
        lt.IncompressibleKineticEnergy(flow_b), interval=2, out=[])
    sim_b = lt.Simulation(
        flow_b, lt.BGKCollision(flow_b.units.relaxation_parameter_lu),
        [rep])
    sim_b(6)
    energies_reporter = [row[2] for row in rep.out[1:]]  # skip step-0 row
    np.testing.assert_allclose(np.asarray(records)[:, 0],
                               energies_reporter, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(flow_a.f),
                                  np.asarray(flow_b.f))
