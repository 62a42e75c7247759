"""Attribute the fp64 `!!!!` validation flags (CPU, fp64, 100 columns).

The reference's committed runs show 0.0 errors because they diff a binary
against its own snapshot (ref: output-example/GNU.haswell.out tail); our
outputs come from XLA's libm, not gfortran's, so transcendental results can
differ by ulps. This experiment quantifies how much of the observed
vs-reference error (~1e-12 errsum/refsum on the worst fields) is explained by
transcendental ulps alone: rerun the identical fp64 scan path with jnp.exp
perturbed by exactly one ulp (x*(1+2^-52)) and measure the per-field
errsum/refsum shift of the perturbed run against the unperturbed one.

If shift(1 ulp in exp) >= observed vs-reference error, the flags are
irreducible libm noise, not an op-order bug.

Usage: JAX_PLATFORMS=cpu python bench/fp64_attribution.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from cloudsc_tpu.data import (default_input_path, default_reference_path,
                                  load_input, load_reference)
    from cloudsc_tpu.params import Params
    from cloudsc_tpu.physics import cloudsc, make_inputs
    from cloudsc_tpu.validate import (FIELD_ATTR, REF_DATASET,
                                      VALIDATION_ORDER, field_errors)

    inp = load_input(default_input_path(), ngptot=100)
    ref = load_reference(default_reference_path(), ngptot=100, ngptotg=100)
    params = Params.from_input(inp)
    fields = make_inputs(inp, dtype=jnp.float64)

    def run():
        fn = jax.jit(lambda f: cloudsc(f, params, inp.ptsphy))
        return jax.block_until_ready(fn(fields))

    base = run()

    # one-ulp multiplicative perturbation of every exp the scheme evaluates
    orig_exp = jnp.exp
    ulp = 2.0 ** -52
    try:
        jnp.exp = lambda x: orig_exp(x) * (1.0 + ulp)
        pert = run()
    finally:
        jnp.exp = orig_exp

    print(f"{'field':<20s} {'vs-ref relerr':>14s} {'1ulp-exp shift':>14s} "
          f"{'explained':>9s}")
    for name, _ in VALIDATION_ORDER:
        got = np.asarray(getattr(base, FIELD_ATTR[name]))
        want = np.asarray(ref[REF_DATASET[name]])
        e_ref = field_errors(name, got, want).relerr
        p = np.asarray(getattr(pert, FIELD_ATTR[name]))
        e_ulp = field_errors(name, p, got).relerr
        tag = "yes" if e_ulp >= e_ref or e_ref == 0.0 else "NO"
        print(f"{name:<20s} {e_ref:14.3e} {e_ulp:14.3e} {tag:>9s}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
