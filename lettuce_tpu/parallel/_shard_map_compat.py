"""shard_map import shim across JAX versions."""

try:
    from jax import shard_map as _sm  # jax >= 0.6-ish

    def shard_map(fn, *, mesh, in_specs, out_specs):
        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _sm_old

    def shard_map(fn, *, mesh, in_specs, out_specs):
        return _sm_old(fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_rep=False)
