"""Adjoint sensitivity of surface precipitation to the temperature profile.

The question a forecaster or data-assimilation system asks: *which levels'
temperature does this column's surface precipitation actually depend on?*
The IFS answers it with hand-written tangent-linear/adjoint physics; here it
is one `jax.grad` through the scan engine (see tests/test_gradients.py for
the correctness pins).

    python examples/adjoint_sensitivity.py            # CPU fp64, ~1 min

Prints, for a few snapshot columns, the five levels whose temperature most
strongly controls total surface precipitation (rain+snow flux through the
lowest half-level), with the sign of the sensitivity.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from cloudsc_tpu.data import default_input_path, load_input
from cloudsc_tpu.params import Params
from cloudsc_tpu.physics import cloudsc, make_inputs


def main() -> int:
    inp = load_input(default_input_path(), ngptot=100)
    params = Params.from_input(inp)
    fields = make_inputs(inp, dtype=jnp.float64)

    def surface_precip(pt):
        f = dict(fields)
        f["pt"] = pt
        out = cloudsc(f, params, inp.ptsphy)
        # rain + snow flux through the lowest half-level, summed over columns
        # (summing makes d/dT(k, col) the per-column sensitivity, since
        # columns are independent)
        return jnp.sum(out.pfplsl[-1] + out.pfplsn[-1])

    g = jax.jit(jax.grad(surface_precip))(fields["pt"])
    g = np.asarray(g)  # (nlev, ncol) kg m-2 s-1 per K

    print("adjoint sensitivity d(surface precip)/d(T level)  [kg m-2 s-1 / K]")
    for col in (0, 17, 42, 83):
        top = np.argsort(-np.abs(g[:, col]))[:5]
        terms = ", ".join(
            f"L{int(k):d}:{g[k, col]:+.2e}" for k in sorted(top)
        )
        print(f"  column {col:3d}: {terms}")
    print(f"  nonzero sensitivities: {(g != 0).sum()} of {g.size} "
          f"(zeros above cloud top / inactive branches)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
