"""lettuce-tpu: a TPU-native lattice Boltzmann framework in JAX.

A from-scratch rebuild of the capabilities of PhiSpel/lettuce
(GPU/PyTorch LBM framework) designed TPU-first:

  * pure-functional core — the per-step update is a jitted pure function;
    whole rollouts run inside ``lax.fori_loop`` / ``lax.scan`` and
    differentiate end-to-end with ``jax.grad``;
  * ONE implementation per physics op (equilibrium/collision/boundary) that
    serves both the jnp step and the fused Pallas stream-collide kernel —
    replacing the reference's dual python-op + runtime-CUDA-codegen design;
  * spatial domain decomposition over a ``jax.sharding.Mesh`` with one-plane
    halo exchange on ICI (a new capability the reference lacks).

The flat namespace mirrors the reference's ``import lettuce as lt`` API
(``/root/reference/lettuce/__init__.py``).
"""

from .context import Context
from .stencil import (Stencil, JaxStencil, TorchStencil,
                      D1Q3, D2Q9, D3Q15, D3Q19, D3Q27)
from .unit import UnitConversion
from .flow import (Equilibrium, Flow, Boundary, pressure_poisson,
                   initialize_pressure_poisson, initialize_f_neq)
from .simulation import Collision, Reporter, Simulation
from .ops import *  # noqa: F401,F403
from .models import *  # noqa: F401,F403
from .reporters import (Observable, MaximumVelocity,
                        IncompressibleKineticEnergy, Enstrophy,
                        EnergySpectrum, Mass, DragCoefficient,
                        ObservableReporter,
                        ErrorReporter, VTKReporter, FlowStatistics,
                        NaNGuard, write_image, mean_analytic_error)
from .parallel import DomainDecomposition
from .utils.datautils import HDF5Reporter, LettuceDataset
from .utils.checkpoint import (save_state, restore_state,
                               CheckpointReporter)
from .utils import (get_subclasses, LettuceException, LettuceWarning,
                    InefficientCodeWarning, ExperimentalWarning,
                    jax_gradient, torch_gradient, grid_fine_to_coarse,
                    jax_jacobi, torch_jacobi, append_axes,
                    moment_tensor, get_default_moment_transform, Transform,
                    D1Q3Transform, D2Q9Lallemand, D2Q9Dellar, D3Q27Hermite,
                    D3Q19DHumieres, D3Q27CumulantTransform)

__version__ = "0.1.0"
