"""Production-style multi-step integration (examples/timestep_loop.py).

The dwarf validates a single step; chaining steps through the scheme's own
tendencies is how it runs in the IFS. These tests pin that the chained
integration stays finite and physical, and that step 1 of the loop matches
the plain single-step call (the loop adds no numerical wrapper).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))

from timestep_loop import STATE_KEYS, column_weight, make_step  # noqa: E402

from cloudsc_tpu.physics import cloudsc, make_inputs  # noqa: E402

NSTEPS = 3


@pytest.fixture(scope="module")
def integration(input_100, params):
    fields = make_inputs(input_100, dtype=jnp.float64)
    step = make_step(fields, params, input_100.ptsphy)
    state0 = {k: fields[k] for k in STATE_KEYS}
    final, diags = jax.jit(
        lambda s: jax.lax.scan(step, s, None, length=NSTEPS)
    )(state0)
    return fields, state0, final, diags


def test_chained_steps_finite_and_physical(integration, input_100, params):
    fields, state0, final, diags = integration
    for k in ("pt", "pq", "pa", "pclv"):
        assert np.isfinite(np.asarray(final[k])).all(), k
    pa = np.asarray(final["pa"])
    assert pa.min() >= 0.0 and pa.max() <= 1.0
    # temperatures stay in an atmospheric range after 3 h of physics
    pt = np.asarray(final["pt"])
    assert 150.0 < pt.min() and pt.max() < 340.0
    sprecip = np.asarray(diags["sprecip"])
    assert (sprecip >= 0.0).all()
    # water budget: path change + surface precip = in-column source
    # (detrainment + supersat) >= 0 — the loop must not destroy water
    wpath = np.asarray(diags["wpath"])
    dpog = np.asarray(column_weight(fields, params))
    q0 = (dpog * np.asarray(state0["pq"] + state0["pclv"][:4].sum(axis=0))
          ).sum(axis=0).mean()
    src = (wpath[-1] - q0) + input_100.ptsphy * sprecip.sum()
    assert src > -1e-9


def test_first_loop_step_is_plain_single_step(integration, input_100, params):
    fields, _, _, diags = integration
    out = jax.jit(
        lambda f: cloudsc(f, params, input_100.ptsphy)
    )(fields)
    sp1 = np.asarray(out.pfplsl[-1] + out.pfplsn[-1]).mean()
    # the physics is identical; XLA may re-associate the diagnostic .mean()
    # reduction differently inside the scan body, so allow 1 ulp there
    np.testing.assert_allclose(
        np.asarray(diags["sprecip"])[0], sp1, rtol=5e-16, atol=0.0
    )
