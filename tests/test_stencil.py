"""Stencil invariants (reference tests/stencil/)."""

import numpy as np

import lettuce_tpu as lt


def test_weights_sum_to_one(fix_stencil):
    assert np.isclose(np.sum(fix_stencil.w), 1.0)


def test_opposite(fix_stencil):
    e = np.asarray(fix_stencil.e)
    opp = np.asarray(fix_stencil.opposite)
    assert np.array_equal(e[opp], -e)


def test_first_direction_is_zero(fix_stencil):
    assert np.all(np.asarray(fix_stencil.e[0]) == 0)


def test_symmetry(fix_stencil):
    """Every velocity has its negation in the set; odd moments vanish."""
    e = np.asarray(fix_stencil.e, dtype=float)
    w = np.asarray(fix_stencil.w)
    # sum_q w_q e_q = 0
    assert np.allclose(w @ e, 0.0)
    # second moment isotropy: sum_q w_q e_qa e_qb = cs^2 delta_ab
    second = np.einsum("q,qa,qb->ab", w, e, e)
    assert np.allclose(second, fix_stencil.cs ** 2 * np.eye(fix_stencil.d),
                       atol=1e-12)


def test_dimensions(fix_stencil):
    assert fix_stencil.e.shape == (fix_stencil.q, fix_stencil.d)
    assert len(fix_stencil.w) == fix_stencil.q
    assert len(fix_stencil.opposite) == fix_stencil.q


def test_jax_stencil_mirror(fix_stencil, fix_context):
    js = lt.JaxStencil(fix_stencil, fix_context)
    assert np.allclose(np.asarray(js.e), fix_stencil.e)
    assert np.allclose(np.asarray(js.w), fix_stencil.w)
    assert js.d == fix_stencil.d and js.q == fix_stencil.q
