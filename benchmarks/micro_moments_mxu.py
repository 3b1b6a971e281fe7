"""Micro-bench: per-block LBM moment computation, VPU sums vs MXU dot.

KBC/regularized fragments are VPU-compute-bound (docs/performance.md:
"further gains need an MXU formulation"). The linear part of their
algebra is the moment set m = M f with M a static (n_m, q) matrix
(rho, rho*u, raw second moments = 10 rows at D3Q27). This bench times
exactly that contraction on a realistic kernel slab shape
(q, X, R, 128) three ways:

  vpu   — per-direction signed adds (the current fragments' form)
  mxu   — one lax.dot_general contracting q (leading dim), free (X,R,L)
  mxu2d — per-x 2D dots (27, R*128) after a lane-merging reshape

All variants read the identical slab from HBM and write the identical
(n_m, X, R, 128) output, so the time difference is pure compute.

Usage: python benchmarks/micro_moments_mxu.py [nblocks] [iters] [variants]
(variants: comma-separated subset of vpu,mxu,mxu2d; default all)
"""
from __future__ import annotations

import sys
import os
from functools import partial
from timeit import default_timer as timer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from lettuce_tpu.stencil import D3Q27

Q, X, R, L = 27, 10, 36, 128
NB = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 50

st = D3Q27()
e = np.asarray(st.e, dtype=np.float64)

# moment matrix: rho, ux, uy, uz (momentum), 6 raw second moments
comps = [(a, b) for a in range(3) for b in range(a, 3)]
M_np = np.concatenate([
    np.ones((1, Q)),
    e.T,
    np.array([[e[qi, a] * e[qi, b] for qi in range(Q)] for a, b in comps]),
]).astype(np.float32)
NM = M_np.shape[0]


def kern_vpu(m_ref, f_ref, o_ref):
    del m_ref
    fs = [f_ref[qi] for qi in range(Q)]

    def sdot(row):
        acc = None
        for c, v in zip(row, fs):
            if c == 0.0:
                continue
            t = v if c == 1.0 else (-v if c == -1.0 else v * float(c))
            acc = t if acc is None else acc + t
        return acc

    for mi in range(NM):
        o_ref[mi] = sdot(M_np[mi])


def kern_mxu(m_ref, f_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        m_ref[:], f_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def kern_mxu2d(m_ref, f_ref, o_ref):
    for x in range(X):
        rhs = f_ref[:, x].reshape(Q, R * L)
        o_ref[:, x] = jnp.dot(
            m_ref[:], rhs, preferred_element_type=jnp.float32
        ).reshape(NM, R, L)


def build(kern):
    # M enters as a real kernel input with its own (whole-array) BlockSpec
    # — Pallas TPU rejects closed-over array constants (ADVICE r4).
    return pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=[pl.BlockSpec((NM, Q), lambda i: (0, 0)),
                  pl.BlockSpec((Q, X, R, L), lambda i: (0, i, 0, 0))],
        out_specs=pl.BlockSpec((NM, X, R, L), lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NM, NB * X, R, L), jnp.float32),
    )


key = jax.random.PRNGKey(0)
f = jax.random.uniform(key, (Q, NB * X, R, L), jnp.float32)
M_dev = jnp.asarray(M_np)
bytes_moved = (Q + NM) * NB * X * R * L * 4

sel = (sys.argv[3].split(",") if len(sys.argv) > 3
       else ["vpu", "mxu", "mxu2d"])
for name, kern in [("vpu", kern_vpu), ("mxu", kern_mxu),
                   ("mxu2d", kern_mxu2d)]:
    if name not in sel:
        continue
    try:
        fn = jax.jit(partial(build(kern), M_dev))
        o = fn(f)
        jax.block_until_ready(o)
        _ = float(o.ravel()[0])
        beg = timer()
        for _ in range(ITERS):
            o = fn(f)
        jax.block_until_ready(o)
        _ = float(o.ravel()[0])
        dt = (timer() - beg) / ITERS
        print(f"{name:6s} {dt * 1e3:8.3f} ms  "
              f"{bytes_moved / dt / 1e9:7.1f} GB/s", flush=True)
    except Exception as exc:
        print(f"{name:6s} FAIL {type(exc).__name__}: {str(exc)[:160]}",
              flush=True)
