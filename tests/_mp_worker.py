"""Worker for the 2-rank multi-process test (run via subprocess).

One MPI-rank analogue: joins the jax.distributed coordinator, runs the CLI
end-to-end (config line + perf gather + globally reduced validation table),
then re-runs the library path on this rank's column slice and snapshots the
raw outputs for the parent's bitwise comparison against a single-process run
— the analogue of the reference's 2-rank ctest cases
(ref: src/cloudsc_fortran/CMakeLists.txt:42-73).

Usage: python tests/_mp_worker.py RANK NRANKS PORT OUTDIR [NGPTOTG]
"""

import contextlib
import io
import os
import sys
from pathlib import Path

rank, nranks, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
outdir = Path(sys.argv[4])
ngptotg = int(sys.argv[5]) if len(sys.argv) > 5 else 100

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nranks)
os.environ["JAX_PROCESS_ID"] = str(rank)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from cloudsc_tpu.cli import main  # noqa: E402

buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    rc = main(["1", str(ngptotg), "16", "--precision", "fp64"])
(outdir / f"stdout_{rank}.txt").write_text(buf.getvalue())
assert rc == 0

# raw per-rank outputs for the parent's bitwise slice comparison
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cloudsc_tpu.data import default_input_path, load_input  # noqa: E402
from cloudsc_tpu.params import Params  # noqa: E402
from cloudsc_tpu.runtime.driver import CloudscDriver  # noqa: E402

share = (ngptotg - 1) // nranks + 1
ngptot = min(share, ngptotg - rank * share)
inp = load_input(default_input_path(), ngptot=ngptot, ngptotg=ngptotg,
                 rank=rank, nranks=nranks)
params = Params.from_input(inp)
driver = CloudscDriver(params, inp.ptsphy, dtype=jnp.float64, nproma=16,
                       backend="xla")
out, _, _ = driver.run(inp)
np.savez(
    outdir / f"out_{rank}.npz",
    start=rank * share,
    tendency_loc_t=np.asarray(out.tendency_loc_t),
    pfplsl=np.asarray(out.pfplsl),
    plude=np.asarray(out.plude),
    prainfrac_toprfz=np.asarray(out.prainfrac_toprfz),
)
sys.exit(0)
