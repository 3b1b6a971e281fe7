"""Streaming semantics (reference tests/native/test_native_streaming.py
pattern: tiny hand-set spikes)."""

import jax.numpy as jnp
import numpy as np

import lettuce_tpu as lt
from lettuce_tpu.ops.streaming import stream


def test_stream_moves_spike_along_e():
    stencil = lt.D2Q9()
    f = np.zeros((9, 5, 5))
    for q in range(9):
        f[q, 2, 2] = q + 1.0
    out = np.asarray(stream(jnp.asarray(f), stencil.e))
    for q in range(9):
        ex, ey = stencil.e[q]
        assert out[q, (2 + ex) % 5, (2 + ey) % 5] == q + 1.0
        assert out[q].sum() == q + 1.0


def test_stream_periodic_wraparound():
    stencil = lt.D1Q3()
    f = np.zeros((3, 4))
    f[1, 3] = 1.0  # moving +x at the right edge
    f[2, 0] = 2.0  # moving -x at the left edge
    out = np.asarray(stream(jnp.asarray(f), stencil.e))
    assert out[1, 0] == 1.0
    assert out[2, 3] == 2.0


def test_no_streaming_mask_freezes():
    stencil = lt.D1Q3()
    f = np.arange(12, dtype=float).reshape(3, 4)
    nsm = np.zeros((3, 4), dtype=bool)
    nsm[1] = True  # freeze q=1 everywhere
    out = np.asarray(stream(jnp.asarray(f), stencil.e, jnp.asarray(nsm)))
    np.testing.assert_array_equal(out[1], f[1])
    np.testing.assert_array_equal(out[2], np.roll(f[2], -1))


def test_stream_conserves_mass():
    stencil = lt.D3Q19()
    rng = np.random.RandomState(0)
    f = rng.rand(19, 4, 4, 4)
    out = np.asarray(stream(jnp.asarray(f), stencil.e))
    np.testing.assert_allclose(out.sum(), f.sum())
    # per-q conservation too (pure permutation)
    np.testing.assert_allclose(out.sum(axis=(1, 2, 3)),
                               f.sum(axis=(1, 2, 3)))
