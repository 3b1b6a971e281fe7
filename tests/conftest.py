"""Shared fixtures, mirroring the reference's ``tests/conftest.py`` matrix:
all stencils, f64/f32 dtypes, configuration (platform x dtype x native), and
fake flows (TestFlow / DummyFlow / DummyTGV).

Tests run on CPU with 8 virtual devices so the multi-chip sharding path is
exercised without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

# config.update works even when a sitecustomize already imported jax with a
# different JAX_PLATFORMS; it must run before the first backend use.
if os.environ.get("LETTUCE_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

import lettuce_tpu as lt  # noqa: E402

STENCILS = [lt.D1Q3, lt.D2Q9, lt.D3Q15, lt.D3Q19, lt.D3Q27]


@pytest.fixture(params=STENCILS, ids=lambda s: s.__name__)
def fix_stencil(request):
    return request.param()


@pytest.fixture(params=[lt.D2Q9, lt.D3Q19], ids=lambda s: s.__name__)
def fix_stencil_2d3d(request):
    return request.param()


@pytest.fixture(params=[jnp.float64, jnp.float32],
                ids=["float64", "float32"])
def fix_dtype(request):
    return request.param


@pytest.fixture(params=[(jnp.float64, False), (jnp.float64, True),
                        (jnp.float32, False), (jnp.float32, True)],
                ids=["f64", "f64-native", "f32", "f32-native"])
def fix_configuration(request):
    """(dtype, use_native) pairs — the analog of the reference's
    device x dtype x native matrix (tests/conftest.py:66-84); platform is
    whatever JAX_PLATFORMS says (CPU in CI)."""
    dtype, native = request.param
    return lt.Context(dtype=dtype, use_native=native)


@pytest.fixture
def fix_context():
    return lt.Context(dtype=jnp.float64)


# ----------------------------------------------------------------------
# fake flows (reference tests/conftest.py:195-266)
# ----------------------------------------------------------------------
class TestFlow(lt.ExtFlow):
    """Uniform p=0.01, u=1.01 everywhere; boundaries settable."""

    __test__ = False  # not a pytest collectible

    def __init__(self, context, resolution, reynolds_number=100,
                 mach_number=0.05, stencil=None, equilibrium=None,
                 boundaries=None):
        self._boundaries = boundaries or []
        super().__init__(context, resolution, reynolds_number, mach_number,
                         stencil, equilibrium)

    def make_resolution(self, resolution, stencil=None):
        if isinstance(resolution, int):
            d = stencil.d if stencil is not None else 2
            return [resolution] * d
        return resolution

    def make_units(self, reynolds_number, mach_number, resolution):
        return lt.UnitConversion(
            reynolds_number=reynolds_number, mach_number=mach_number,
            characteristic_length_lu=resolution[0])

    def initial_pu(self):
        shape = tuple(self.resolution)
        p = np.full((1,) + shape, 0.01)
        u = np.full((len(shape),) + shape, 1.01)
        return p, u

    @property
    def boundaries(self):
        return list(self._boundaries)


class DummyFlow(TestFlow):
    """No-op initialisation: f keeps whatever is assigned."""

    def initialize(self):
        pass


@pytest.fixture
def fix_test_flow_factory(fix_context):
    def make(resolution=16, stencil=None, boundaries=None):
        return TestFlow(fix_context, resolution, stencil=stencil,
                        boundaries=boundaries)
    return make
