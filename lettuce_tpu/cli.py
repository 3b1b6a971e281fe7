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
              default="single",
              help="bfloat16, float32 or float64 precision.")
@click.option("--use-native/--use-no-native", default=True,
              help="Use the fused Pallas stream-collide kernel.")
# reference-compatible aliases
@click.option("--cuda/--no-cuda", "cuda", default=None, hidden=True)
@click.option("--use-cuda_native/--use-no-cuda_native", "cuda_native",
              default=None, hidden=True)
@click.pass_context
def main(ctx, tpu, precision, use_native, cuda, cuda_native):
    """lettuce-tpu — TPU-native lattice Boltzmann framework."""
    import jax
    import jax.numpy as jnp

    if cuda is not None:  # reference-flag alias
        tpu = cuda
    if cuda_native is not None:
        use_native = cuda_native

    dtype = {"half": jnp.bfloat16, "single": jnp.float32,
             "double": jnp.float64}[precision]
    device = None
    if not tpu:
        device = "cpu"
    else:
        try:
            jax.devices("tpu")
        except RuntimeError:
            device = "cpu"
    ctx.obj = lt.Context(device=device, dtype=dtype, use_native=use_native)


@main.command()
@click.option("-s", "--steps", type=int, default=10,
              help="Number of simulation steps.")
@click.option("-r", "--resolution", type=int, default=1024,
              help="Grid points per dimension.")
@click.option("-f", "--flow", "flow_name", default="taylor2d",
              type=click.Choice(sorted(lt.flow_by_name)))
@click.option("-v", "--vtk-out", is_flag=True, default=False)
@click.option("--profile-out", type=str, default="",
              help="File to write cProfile results to.")
@click.pass_obj
def benchmark(context, steps, resolution, flow_name, vtk_out, profile_out):
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

    reporters = []
    if vtk_out:
        reporters.append(lt.VTKReporter(interval=max(1, steps // 10)))
    simulation = lt.Simulation(flow, collision, reporters)
    mlups = simulation(steps)

    if profile_out:
        profile.disable()
        stats = pstats.Stats(profile)
        stats.sort_stats("cumulative")
        stats.dump_stats(profile_out)
        click.echo(f"profile written to {profile_out}")

    click.echo(f"Finished {steps} steps in {context.dtype.name} "
               f"on {context.platform} ({simulation._step_kind} path). "
               f"MLUPS: {mlups:10.2f}")
    return mlups


@main.command()
@click.option("--max-resolution-exponent", type=int, default=7)
@click.pass_obj
def convergence(context, max_resolution_exponent):
    """TGV2D diffusive-scaling order check; exits 1 when the measured
    orders leave [u: 2 +- 0.3, p: > 0.5]."""
    errors = []
    resolutions = [2 ** e for e in range(4, max_resolution_exponent + 1)]
    click.echo("resolution  error_u        error_p")
    for resolution in resolutions:
        mach = 8 / resolution
        flow = lt.TaylorGreenVortex(context, resolution,
                                    reynolds_number=10000,
                                    mach_number=mach, stencil=lt.D2Q9(),
                                    initialize_fneq=False)
        out = []
        reporter = lt.ErrorReporter(flow.analytic_solution,
                                    interval=10 * resolution, out=out)
        simulation = lt.Simulation(
            flow, lt.BGKCollision(tau=flow.units.relaxation_parameter_lu),
            [reporter])
        simulation(10 * resolution)
        err_u, err_p = out[-1]
        errors.append((err_u, err_p))
        click.echo(f"{resolution:10d}  {err_u:.6e}  {err_p:.6e}")

    errors = np.asarray(errors)
    orders_u = np.log2(errors[:-1, 0] / errors[1:, 0])
    orders_p = np.log2(errors[:-1, 1] / errors[1:, 1])
    order_u, order_p = orders_u.mean(), orders_p.mean()
    click.echo(f"order(u) = {order_u:.3f}   order(p) = {order_p:.3f}")
    if abs(order_u - 2.0) > 0.3 or order_p < 0.5:
        click.echo("Convergence order failed.")
        sys.exit(1)


if __name__ == "__main__":
    main()
