"""Dev harness: run the jnp cloudsc at 100 cols fp64 on CPU, diff vs reference.h5."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import cloudsc_tpu

cloudsc_tpu.enable_compilation_cache()

from cloudsc_tpu.data import load_input, load_reference
from cloudsc_tpu.params import Params
from cloudsc_tpu.physics import cloudsc, make_inputs

OUT_MAP = {
    "PLUDE": "plude",
    "PCOVPTOT": "pcovptot",
    "PRAINFRAC_TOPRFZ": "prainfrac_toprfz",
    "PFSQLF": "pfsqlf", "PFSQIF": "pfsqif",
    "PFCQLNG": "pfcqlng", "PFCQNNG": "pfcqnng",
    "PFSQRF": "pfsqrf", "PFSQSF": "pfsqsf",
    "PFCQRNG": "pfcqrng", "PFCQSNG": "pfcqsng",
    "PFSQLTUR": "pfsqltur", "PFSQITUR": "pfsqitur",
    "PFPLSL": "pfplsl", "PFPLSN": "pfplsn",
    "PFHPSL": "pfhpsl", "PFHPSN": "pfhpsn",
    "TENDENCY_LOC_A": "tendency_loc_a",
    "TENDENCY_LOC_Q": "tendency_loc_q",
    "TENDENCY_LOC_T": "tendency_loc_t",
    "TENDENCY_LOC_CLD": "tendency_loc_cld",
}


def main():
    inp = load_input("/root/reference/data", ngptot=100)
    params = Params.from_input(inp)
    fields = make_inputs(inp, dtype=jax.numpy.float64)
    fn = jax.jit(lambda f: cloudsc(f, params, inp.ptsphy))
    out = jax.block_until_ready(fn(fields))
    ref = load_reference("/root/reference/config-files/reference.h5")

    worst = 0.0
    print(f"{'field':22s} {'maxabserr':>12s} {'relerr':>12s} {'sum|ref|':>12s}")
    for name, attr in OUT_MAP.items():
        got = np.asarray(getattr(out, attr))
        want = ref[name]
        assert got.shape == want.shape, (name, got.shape, want.shape)
        diff = np.abs(got - want)
        errsum = diff.sum()
        refsum = np.abs(want).sum()
        rel = errsum / refsum if refsum > 1e-300 else errsum
        worst = max(worst, rel)
        flag = " !!" if rel > 1e-12 else ""
        print(f"{name:22s} {diff.max():12.4e} {rel:12.4e} {refsum:12.4e}{flag}")
    print(f"\nworst relative error: {worst:.4e}")
    return 0 if worst < 1e-12 else 1


if __name__ == "__main__":
    sys.exit(main())
