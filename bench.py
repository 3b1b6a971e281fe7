"""Headline benchmark: MLUPS for D3Q19 BGK Taylor-Green at 256^3
(BASELINE.json north star: >= 5000 MLUPS on TPU v5e; vs_baseline is
MLUPS / 5000).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "MLUPS", "vs_baseline": N}

The measurement runs in a watchdog child process: the remote TPU tunnel
occasionally hangs on backend init (observed intermittently), which a
timeout + one retry turns from a lost benchmark into a ~12-minute blip.
"""

import json
import os
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "")  # let jax pick TPU if present


def watchdog(timeout_s: int = 660, retries: int = 2) -> int:
    """Run this script as a child with a timeout; retry once on a hang or
    crash; forward the child's final JSON line."""
    env = dict(os.environ, LETTUCE_BENCH_CHILD="1")
    last_err = ""
    for _ in range(retries + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=timeout_s)
        except subprocess.TimeoutExpired:
            last_err = f"benchmark child hung past {timeout_s}s"
            continue
        lines = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("{")]
        if proc.returncode == 0 and lines:
            print(lines[-1])
            return 0
        last_err = (proc.stderr.strip().splitlines() or ["no output"])[-1]
    print(json.dumps({"metric": "MLUPS (benchmark failed)", "value": -1.0,
                      "unit": "MLUPS", "vs_baseline": -1.0,
                      "error": last_err[:200]}))
    return 1


def main():
    import jax
    import jax.numpy as jnp

    import lettuce_tpu as lt

    platform = jax.devices()[0].platform
    on_accel = platform in ("tpu", "gpu")
    resolution = 256 if on_accel else 32
    # ~8e9 site updates: the remote tunnel's dispatch+fetch overhead
    # (~0.1 s) under-reports sub-second timed runs by 20-35%
    steps = 480 if on_accel else 10
    warmup = 40 if on_accel else 2

    def run(half):
        context = lt.Context(dtype=jnp.float32, use_native=True)
        flow = lt.TaylorGreenVortex(context, resolution,
                                    reynolds_number=1600,
                                    mach_number=0.05, stencil=lt.D3Q19(),
                                    initialize_fneq=False)
        collision = lt.BGKCollision(
            tau=flow.units.relaxation_parameter_lu)
        simulation = lt.Simulation(flow, collision, [],
                                   half_storage=half)
        simulation(warmup)  # compile + warm caches
        span = (simulation._step_dev_multi or simulation._step_multi
                or (None, 1))[1]
        return simulation(steps), f"{simulation._step_kind} x{span}"

    # headline config: fused kernel with temporal blocking (n_sub
    # collide-stream steps per launch). Both storage modes are measured
    # and reported in the one JSON line — pure f32 is the apples-to-apples
    # number vs the f32 reference path; bf16 deviation storage (f32
    # compute) is the throughput mode. The headline value is the faster.
    storage = "f32, temporally blocked"
    mlups_f32 = mlups_dev = -1.0
    try:
        assert on_accel
        mlups, kind = run(half=False)
        mlups_f32 = mlups
    except Exception:
        mlups = -1.0
    try:
        assert on_accel
        mlups_dev, kind_h = run(half=True)
        if mlups_dev > mlups:
            mlups, kind = mlups_dev, kind_h
            storage = "bf16-dev storage, f32 compute"
    except Exception:
        pass
    if mlups < 0:
        storage = "f32"
        mlups, kind = run(half=False)
        mlups_f32 = mlups

    baseline = 5000.0  # north-star target MLUPS (BASELINE.json)
    result = {
        "metric": f"MLUPS D3Q19 BGK TGV {resolution}^3 "
                  f"({platform}, {kind} path, {storage})",
        "value": round(mlups, 2),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / baseline, 4),
    }
    if mlups_f32 > 0:
        result["f32_mlups"] = round(mlups_f32, 2)
    if mlups_dev > 0:
        result["bf16_dev_mlups"] = round(mlups_dev, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("LETTUCE_BENCH_CHILD"):
        main()
    else:
        sys.exit(watchdog())
