"""shard_map import shim across JAX versions.

check_vma (formerly check_rep) is disabled: the fused Pallas kernel runs
inside the shard-mapped step, and pallas_call does not yet declare varying
mesh axes on its outputs.
"""

try:
    from jax import shard_map as _sm  # jax >= 0.6-ish

    def shard_map(fn, *, mesh, in_specs, out_specs):
        try:
            return _sm(fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
        except TypeError:  # older signature
            return _sm(fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _sm_old

    def shard_map(fn, *, mesh, in_specs, out_specs):
        return _sm_old(fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_rep=False)
