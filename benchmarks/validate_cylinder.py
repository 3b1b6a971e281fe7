"""Physics validation: vortex shedding behind a circular cylinder.

At Re = 150 a cylinder in cross-flow sheds a von Karman street with
Strouhal number St = f D / U ~ 0.18 (Williamson 1989: 0.183 for an
unbounded cylinder; mild blockage raises it slightly). The shedding
frequency is measured from the cross-stream velocity at a probe behind
the cylinder.

Writes benchmarks/cylinder_validation.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(re=150, resolution=(1280, 896), domain_length_x=32.0):
    # 40 cells/diameter at blockage D/H = 40/896 = 0.045: Williamson's
    # St = 0.183 is an unbounded value, and at the previous 0.104
    # blockage the confinement itself raises St ~8-10% (Turki et al.
    # 2003 measure +9% at beta = 1/8, Re 140); at beta <= 0.05 the
    # shift is within ~2%, so the unbounded value is the honest target
    import lettuce_tpu as lt
    from lettuce_tpu.reporters import Observable

    class ObstacleEqOutlet(lt.Obstacle):
        """Obstacle with a constant-pressure equilibrium outlet.

        The reference's AntiBounceBackOutlet amplifies the startup acoustic
        wave and diverges on this configuration — verified against the
        reference itself (torch CPU, identical setup, NaN by step ~1500).
        The equilibrium-pressure outlet is stable.
        """

        @property
        def boundaries(self):
            x = self.grid[0]
            return [
                lt.EquilibriumBoundaryPU(
                    context=self.context,
                    mask=np.asarray(jnp.abs(x) < 1e-6),
                    velocity=np.asarray(
                        self.units.characteristic_velocity_pu
                        * self._unit_vector())),
                lt.EquilibriumOutletP(
                    self._unit_vector().astype(int).tolist(), self),
                lt.BounceBackBoundary(self._mask),
            ]

    context = lt.Context(dtype=jnp.float32)
    # 40 cells per diameter and Ma 0.075 keep tau ~ 0.535 (plain BGK at
    # tau ~ 0.51 goes unstable at the sharp bounce-back edge); the
    # regularized collision adds further robustness
    flow = ObstacleEqOutlet(context, list(resolution), reynolds_number=re,
                            mach_number=0.075,
                            domain_length_x=domain_length_x)
    x, y = flow.grid
    cx, cy = domain_length_x / 4, domain_length_x / 4  # centre of y-extent
    cy = float(np.asarray(y).max()) / 2
    flow.mask = np.asarray((x - cx) ** 2 + (y - cy) ** 2 < 0.25)  # D = 1
    flow.initialize()

    collision = lt.RegularizedCollision(
        tau=flow.units.relaxation_parameter_lu)
    simulation = lt.Simulation(flow, collision, [])

    # probe 2 diameters downstream, on the centreline: u_y oscillates at
    # the shedding frequency
    dx = flow.units.convert_length_to_pu(1.0)
    ix = int(round((cx + 2.0) / dx))
    iy = int(round(cy / dx))

    class ProbeUy(Observable):
        def __call__(self, f=None):
            fl = self.flow if f is None else self.flow.view(f)
            return fl.u_pu[1, ix, iy]

    dt = flow.units.convert_time_to_pu(1)
    # transient, then record ~20 shedding periods
    t_trans, t_meas, rec_dt = 60.0, 120.0, 0.2
    interval = max(1, int(round(rec_dt / dt)))
    # warm the step program, then time the transient phase alone — the
    # recording rollout pays a one-off scan compile that would otherwise
    # pollute the throughput number
    simulation(2)
    import time
    t0 = time.perf_counter()
    trans_steps = int(t_trans / dt)
    simulation(trans_steps)
    elapsed = time.perf_counter() - t0
    n_steps = int(t_meas / dt) // interval * interval
    records = np.asarray(jax.device_get(
        simulation.rollout(n_steps, observables=[ProbeUy(flow)],
                           interval=interval)), dtype=np.float64)[:, 0]

    sig = records - records.mean()
    freqs = np.fft.rfftfreq(len(sig), d=interval * dt)
    amp = np.abs(np.fft.rfft(sig * np.hanning(len(sig))))
    k = int(np.argmax(amp[1:])) + 1
    # parabolic interpolation of the spectral peak: the raw bin width
    # 1/t_meas would quantise St at the few-percent level
    if 1 <= k < len(amp) - 1:
        la, lb, lc = np.log(amp[k - 1:k + 2] + 1e-300)
        k = k + 0.5 * (la - lc) / (la - 2 * lb + lc)
    f_shed = float(k * (freqs[1] - freqs[0]))
    strouhal = f_shed * 1.0 / 1.0  # D = U = 1 in physical units

    mlups = trans_steps * resolution[0] * resolution[1] / 1e6 / elapsed
    blockage = (1.0 / dx) / resolution[1]
    result = {
        "reynolds": re,
        "resolution": list(resolution),
        "blockage": round(blockage, 4),
        "strouhal": round(strouhal, 4),
        "reference": "St = 0.183 (Williamson 1989, unbounded); at "
                     "blockage <= 0.05 confinement shifts St by < ~2%",
        "probe_rms_uy": round(float(sig.std()), 4),
        "mlups": round(mlups, 1),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "cylinder_validation.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"St = {strouhal:.4f} (reference ~0.183), rms u_y "
          f"{sig.std():.4f}, {mlups:.0f} MLUPS", flush=True)


if __name__ == "__main__":
    main()
