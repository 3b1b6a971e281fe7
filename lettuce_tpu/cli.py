"""Command-line interface: ``lettuce-tpu benchmark`` / ``convergence``.

Parity with the reference click CLI (``/root/reference/lettuce/cli.py``):
same subcommands, flags for precision/native, MLUPS benchmark with optional
profiling and VTK output, and the TGV2D diffusive-scaling convergence gate
that exits 1 on failure.
"""

from __future__ import annotations

import cProfile
import pstats
import sys

import click
import numpy as np

import lettuce_tpu as lt


@click.group()
@click.version_option(version=lt.__version__, message="lettuce-tpu %(version)s")
@click.option("--tpu/--no-tpu", default=True,
              help="Run on TPU if available; no-tpu forces CPU.")
@click.option("-p", "--precision",
              type=click.Choice(["half", "single", "double"]),
              default="double",
              help="bfloat16, float32 or float64 precision (default double, "
                   "as the reference CLI; use single/half for TPU "
                   "throughput).")
@click.option("--use-native/--use-no-native", default=True,
              help="Use the fused Pallas stream-collide kernel.")
@click.option("-i", "--device-id", type=int, default=None,
              help="Pin to jax.devices()[i] on a multi-chip host "
                   "(reference -i/--gpu-id parity, cli.py:29-47).")
# reference-compatible aliases
@click.option("--cuda/--no-cuda", "cuda", default=None, hidden=True)
@click.option("--use-cuda_native/--use-no-cuda_native", "cuda_native",
              default=None, hidden=True)
@click.option("--gpu-id", "gpu_id", type=int, default=None, hidden=True)
@click.pass_context
def main(ctx, tpu, precision, use_native, device_id, cuda, cuda_native,
         gpu_id):
    """lettuce-tpu — TPU-native lattice Boltzmann framework."""
    import jax
    import jax.numpy as jnp

    if cuda is not None:  # reference-flag alias
        tpu = cuda
    if cuda_native is not None:
        use_native = cuda_native
    if device_id is None and gpu_id is not None:  # reference-flag alias
        device_id = gpu_id

    dtype = {"half": jnp.bfloat16, "single": jnp.float32,
             "double": jnp.float64}[precision]
    device = None
    if not tpu:
        device = "cpu"
        # force the CPU platform so no accelerator backend is even
        # initialised — on shared hosts, merely initialising the TPU
        # backend claims the chip and blocks other processes
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backend already initialised in-process (tests)
    else:
        try:
            jax.devices("tpu")
        except RuntimeError:
            device = "cpu"
    if device_id is not None:
        pool = jax.devices(device) if device else jax.devices()
        if not 0 <= device_id < len(pool):
            raise click.BadParameter(
                f"device id {device_id} out of range: "
                f"{len(pool)} device(s) available")
        device = pool[device_id]
    ctx.obj = lt.Context(device=device, dtype=dtype, use_native=use_native)


@main.command()
@click.option("-s", "--steps", type=int, default=10,
              help="Number of simulation steps.")
@click.option("-r", "--resolution", type=int, default=1024,
              help="Grid points per dimension.")
@click.option("-f", "--flow", "flow_name", default="taylor2d",
              type=click.Choice(sorted(lt.flow_by_name)))
@click.option("-v", "--vtk-out", is_flag=True, default=False)
@click.option("--half-storage", is_flag=True, default=False,
              help="Keep the state as bfloat16 deviations between steps "
                   "(halved traffic, f32 compute; needs the fused "
                   "kernel).")
@click.option("--mesh", type=str, default="",
              help="Shard the grid over a device mesh, e.g. '8' (split x "
                   "over 8 chips) or '4,2' (x and y). Streaming becomes "
                   "local rolls + ppermute halo exchange over ICI.")
@click.option("--profile-out", type=str, default="",
              help="File to write cProfile results to.")
@click.pass_obj
def benchmark(context, steps, resolution, flow_name, vtk_out, half_storage,
              mesh, profile_out):
    """Run a short simulation and print the throughput in MLUPS."""
    if profile_out:
        profile = cProfile.Profile()
        profile.enable()

    flow_class, stencil = lt.flow_by_name[flow_name]
    if flow_name == "decay2d":
        flow = flow_class(context, [resolution] * 2, 10000, 0.05, randseed=0)
    else:
        flow = flow_class(context, resolution, 10000, 0.05,
                          stencil=stencil())

    force = None
    if hasattr(flow, "acceleration"):
        force = lt.Guo(flow, tau=flow.units.relaxation_parameter_lu,
                       acceleration=flow.units.convert_acceleration_to_lu(
                           flow.acceleration))
    collision = lt.BGKCollision(tau=flow.units.relaxation_parameter_lu,
                                force=force)

    decomposition = None
    if mesh:
        import jax
        try:
            mesh_shape = tuple(int(n) for n in mesh.split(","))
            if not mesh_shape or any(n < 1 for n in mesh_shape):
                raise ValueError
        except ValueError:
            raise click.BadParameter(
                f"mesh must be comma-separated positive integers "
                f"(e.g. '8' or '4,2'), got {mesh!r}")
        n_needed = int(np.prod(mesh_shape))
        if n_needed > len(jax.devices()):
            raise click.BadParameter(
                f"mesh {mesh_shape} needs {n_needed} devices; "
                f"{len(jax.devices())} available")
        for axis, n in enumerate(mesh_shape):
            res = (flow.resolution[axis]
                   if axis < len(flow.resolution) else None)
            if res is None or res % n:
                raise click.BadParameter(
                    f"resolution {list(flow.resolution)} does not divide "
                    f"evenly over mesh {mesh_shape}")
        decomposition = lt.DomainDecomposition(mesh_shape=mesh_shape)

    reporters = []
    if vtk_out:
        reporters.append(lt.VTKReporter(interval=max(1, steps // 10)))
    simulation = lt.Simulation(flow, collision, reporters,
                               half_storage=half_storage,
                               decomposition=decomposition)
    mlups = simulation(steps)

    if profile_out:
        profile.disable()
        stats = pstats.Stats(profile)
        stats.sort_stats("cumulative")
        stats.dump_stats(profile_out)
        click.echo(f"profile written to {profile_out}")

    click.echo(f"Finished {steps} steps in {context.dtype.name} "
               f"on {context.platform} ({simulation.step_path} path). "
               f"MLUPS: {mlups:10.2f}")
    return mlups


@main.command()
@click.option("--max-resolution-exponent", type=int, default=8)
@click.pass_obj
def convergence(context, max_resolution_exponent):
    """TGV2D diffusive-scaling order check at the reference's protocol
    (``/root/reference/lettuce/cli.py:129-180``): per-step errors at
    interval=1 averaged over the run, resolutions 2^4..2^8, gate on the
    final refinement factor — u order in [1.9, 2.1], p order in [0.9, 1.1].
    Exits 1 on failure.

    TPU-first: the per-step error sequence is computed on device in one
    ``lax.scan`` (``mean_analytic_error``) instead of 10*resolution host
    callbacks.
    """
    from timeit import default_timer as timer

    error_u_old = error_p_old = None
    factor_u = factor_p = 0.0
    click.echo(("{:>15} " * 6).format("resolution", "error (u)", "order (u)",
                                      "error (p)", "order (p)", "MLUPS"))
    for e in range(4, max_resolution_exponent + 1):
        resolution = 2 ** e
        mach_number = 8 / resolution
        flow = lt.TaylorGreenVortex(context, [resolution] * 2,
                                    reynolds_number=10000,
                                    mach_number=mach_number,
                                    stencil=lt.D2Q9())
        simulation = lt.Simulation(
            flow, lt.BGKCollision(tau=flow.units.relaxation_parameter_lu),
            [])
        num_steps = 10 * resolution
        beg = timer()
        error_u, error_p = lt.mean_analytic_error(simulation, num_steps)
        mlups = num_steps * resolution ** 2 / 1e6 / (timer() - beg)

        factor_u = 0 if error_u_old is None else error_u_old / error_u
        factor_p = 0 if error_p_old is None else error_p_old / error_p
        error_u_old, error_p_old = error_u, error_p
        click.echo(f"{resolution:15} {error_u:15.2e} {factor_u / 2:15.2f} "
                   f"{error_p:15.2e} {factor_p / 2:15.2f} {mlups:15.2f}")

    tol = 1e-1
    if not (2 - tol) < factor_u / 2 < (2 + tol):
        click.echo(f"FAILED: Velocity convergence order {factor_u / 2} is "
                   f"not in [1.9, 2.1].")
        sys.exit(1)
    if not (1 - tol) < factor_p / 2 < (1 + tol):
        click.echo(f"FAILED: Pressure convergence order {factor_p / 2} is "
                   f"not in [0.9, 1.1].")
        sys.exit(1)


if __name__ == "__main__":
    main()
