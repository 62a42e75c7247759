"""Differentiability: tangent-linear (jvp) and adjoint (vjp) of the scheme.

The reference ecosystem needs hand-written tangent-linear/adjoint cloud
schemes for 4D-Var data assimilation (the IFS maintains them as separate
code); here both come from jax.jvp/jax.vjp through the scan engine. The
physics is piecewise smooth (every reference IF becomes a select), so
derivatives are exact on each branch; pow/sqrt-at-zero sites use a guarded
form whose FORWARD value is bitwise identical (the fp64 goldens pin that)
but whose cotangent at the clamp is 0 instead of inf/NaN.

These tests pin: finite gradients for every output head, jvp == directional
finite difference at small step, and vjp-vs-jvp adjoint consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cloudsc_tpu.physics import cloudsc, make_inputs

OUTPUTS = ("tendency_loc_t", "tendency_loc_q", "pcovptot", "pfplsl",
           "pfplsn", "pfhpsl", "pfsqlf", "plude")


@pytest.fixture(scope="module")
def grad_setup(input_100, params):
    fields = make_inputs(input_100, dtype=jnp.float64)

    def scalar_head(pt):
        f = dict(fields)
        f["pt"] = pt
        out = cloudsc(f, params, input_100.ptsphy)
        # one scalar mixing every differentiable output head
        return sum(jnp.sum(getattr(out, n) ** 2) for n in OUTPUTS) * 1e6

    pt = fields["pt"]
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(pt.shape) * 0.01)  # ~0.01 K
    return scalar_head, pt, v


def test_adjoint_finite_everywhere(grad_setup):
    f, pt, _ = grad_setup
    g = jax.jit(jax.grad(f))(pt)
    g = np.asarray(g)
    assert np.isfinite(g).all(), "NaN/inf in the adjoint"
    assert np.abs(g).max() > 0.0, "identically-zero adjoint"


def test_tangent_matches_finite_difference(grad_setup):
    f, pt, v = grad_setup
    _, jv = jax.jvp(f, (pt,), (v,))
    eps = 1e-3
    fd = (f(pt + eps * v) - f(pt - eps * v)) / (2 * eps)
    rel = abs(float(fd - jv)) / max(abs(float(jv)), 1e-30)
    # central FD on a piecewise-smooth fp64 function: O(eps^2) truncation
    # plus branch flips near switch points bound this loosely
    assert rel < 1e-4, f"jvp vs FD rel err {rel}"


def test_adjoint_consistent_with_tangent(grad_setup):
    f, pt, v = grad_setup
    _, jv = jax.jvp(f, (pt,), (v,))
    g = jax.grad(f)(pt)
    vg = jnp.vdot(g, v)
    rel = abs(float(vg - jv)) / max(abs(float(jv)), 1e-30)
    assert rel < 1e-12, f"<grad, v> != jvp (rel {rel})"


@pytest.mark.parametrize("name", ["rcldiff", "rkooptau"])
def test_parameter_gradient_matches_fd(input_100, params, name):
    """Physics-parameter Jacobians (the calibration use case,
    examples/param_calibration.py): TECLDP scalars enter the scheme
    arithmetically, so replacing the Python float with a traced value
    yields d(output)/d(theta) through the full scan."""
    import copy

    fields = make_inputs(input_100, dtype=jnp.float64)
    theta0 = getattr(params.ydecldp, name)

    def loss(theta):
        p = copy.copy(params)
        p.ydecldp = copy.copy(params.ydecldp)
        setattr(p.ydecldp, name, theta)
        out = cloudsc(fields, p, input_100.ptsphy)
        return jnp.sum(out.tendency_loc_t ** 2) * 1e6

    g = float(jax.grad(loss)(jnp.float64(theta0)))
    eps = theta0 * 1e-6
    fd = float((loss(jnp.float64(theta0 + eps))
                - loss(jnp.float64(theta0 - eps))) / (2 * eps))
    assert np.isfinite(g) and g != 0.0, f"degenerate d/d{name}: {g}"
    rel = abs(g - fd) / max(abs(fd), 1e-30)
    assert rel < 1e-5, f"d/d{name} grad {g} vs fd {fd} (rel {rel})"
