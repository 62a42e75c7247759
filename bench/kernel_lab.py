"""Kernel performance lab — attribute step time to DMA vs compute on the TPU.

Measures the fused Pallas kernel (packed storage) in three bodies with
IDENTICAL BlockSpecs and I/O volume:
  full   the production physics body
  init   section-1 (level_init) compute only
  floor  degenerate compute (pure streaming floor)
across (sublanes, levels-per-step) variants and column counts. If
full ~= floor + compute the pipeline is serialized; if full ~= max(floor,
compute) the DMA overlaps compute and the kernel is bound by the larger.
(Resolved in round 5b: bench/overlap_probe.py measured full ~= max in
every production-shaped variant — the kernel is COMPUTE-bound and the
floor hides fully under the VPU time; docs/PERFORMANCE.md "The overlap
verdict".)

Timing methodology matches bench.py: iterations chained in one jitted
fori_loop, dispatch floor subtracted, sync on a tiny on-device slice.

Usage:
    python bench/kernel_lab.py [--ngptot 163840 ...] [--sb 32] [--lps 2 3 6]
        [--modes full floor init] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _sync(x):
    import numpy as np

    return np.asarray(x[(0,) * (x.ndim - 1)][:1])


def _dispatch_floor() -> float:
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 128), jnp.float32)
    fn = jax.jit(lambda a: a * 2.0)
    _sync(fn(x))
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        _sync(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ngptot", type=int, nargs="+", default=[163840])
    p.add_argument("--sb", type=int, nargs="+", default=[32])
    p.add_argument("--lps", type=int, nargs="+", default=[2])
    p.add_argument("--modes", nargs="+", default=["full"])
    p.add_argument("--order", nargs="+", default=["cyclic"],
                   choices=["cyclic", "grouped", "sorted"],
                   help="column expansion layout(s) to sweep: grouped makes "
                        "tiles homogeneous so per-tile skips fire per-column; "
                        "sorted additionally orders the source columns by "
                        "activity (expand.activity_perm — the driver default)")
    p.add_argument("--skip", nargs="+", default=[""],
                   help="comma-joined section tags to skip, swept one value "
                        "per run (attribution; '' = full physics)")
    p.add_argument("--fold", type=int, nargs="+", default=[-1],
                   help="folded packed layout(s) to sweep (0/1; -1 = the "
                        "CLOUDSC_FOLD_INPUTS env default). Folding removes "
                        "~1/3 of the streamed input rows — A/B it "
                        "interleaved within one session")
    p.add_argument("--tilem", type=int, nargs="+", default=[0],
                   help="tile-major relayout(s) to sweep (0/1, folded packs "
                        "only): each grid step's DMA becomes one contiguous "
                        "run instead of lps*nrows 16 kB runs "
                        "(pack_to_tile_major; bench/dma_probe.py measures "
                        "the synthetic ceiling)")
    p.add_argument("--foldc", type=int, nargs="+", default=[-1],
                   help="folded saturation-curve rows to sweep (0/1; -1 = "
                        "the CLOUDSC_FOLD_CURVES env default): stream "
                        "section-1's saturation block (9 rows) instead of "
                        "computing its 2 exp + 8 divides per level "
                        "(physics/satfold.py)")
    p.add_argument("--foldn", type=int, nargs="+", default=[-1],
                   help="folded 3.4b Newton row to sweep (0/1; -1 = the "
                        "CLOUDSC_FOLD_NEWTON env default): stream ZDQS "
                        "instead of the in-kernel CUADJTQ")
    p.add_argument("--foldd", type=int, nargs="+", default=[-1],
                   help="folded 3.7 deposition rows to sweep (0/1; -1 = the "
                        "CLOUDSC_FOLD_DEP env default): stream the raw "
                        "deposition amount + nuclei factor (2 rows) instead "
                        "of the in-kernel exp/pow/sqrt chain")
    p.add_argument("--foldo", type=int, nargs="+", default=[-1],
                   help="folded OUTPUT rows to sweep (0/1; -1 = the "
                        "CLOUDSC_FOLD_OUTPUTS env default): drop the 4 "
                        "derivable half-level flux rows from the streamed "
                        "outputs, synthesize them in _assemble (bitwise)")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--out", default=None)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    import cloudsc_tpu

    cloudsc_tpu.enable_compilation_cache()

    from cloudsc_tpu.data import default_input_path, load_input
    from cloudsc_tpu.kernels.pallas_cloudsc import cloudsc_pallas
    from cloudsc_tpu.params import Params
    from cloudsc_tpu.physics.scheme import SchemeConfig

    floor_s = _dispatch_floor()
    print(f"# dispatch floor: {floor_s * 1e3:.2f} ms", flush=True)
    results = []

    for ngptot in a.ngptot:
        inp = load_input(default_input_path(), ngptot=ngptot, expand=False)
        params = Params.from_input(inp)
        from cloudsc_tpu.kernels.pallas_cloudsc import pack_inputs_raw

        for sb, lps, order, fold, tilem, foldo, foldc, foldn, foldd in (
            (s, l, o, fl, tm, fo, fcv, fnv, fdv) for s in a.sb for l in a.lps
            for o in a.order for fl in a.fold for tm in a.tilem
            for fo in a.foldo for fcv in a.foldc for fnv in a.foldn
            for fdv in a.foldd
        ):
            # lps must be pinned BEFORE packing: the pad-row decision at pack
            # time (_lps_for) has to agree with the kernel's level blocking
            os.environ["CLOUDSC_PALLAS_LPS"] = str(lps)
            # fc/fn likewise decide the pack layout at pack time (the kernel
            # infers them back from the pack's row count)
            if foldc >= 0:
                os.environ["CLOUDSC_FOLD_CURVES"] = str(foldc)
            if foldn >= 0:
                os.environ["CLOUDSC_FOLD_NEWTON"] = str(foldn)
            if foldd >= 0:
                os.environ["CLOUDSC_FOLD_DEP"] = str(foldd)
            perm = None
            if order == "sorted":
                from cloudsc_tpu.data.expand import activity_perm

                perm = activity_perm(
                    inp.fields["PCLV"], inp.fields["TENDENCY_TMP_CLD"],
                    inp.ptsphy, params.ydecldp.rlmin,
                )
            packed, ncol = pack_inputs_raw(
                inp, sb, params,
                column_order="grouped" if order == "sorted" else order,
                column_perm=perm,
                fold=None if fold < 0 else bool(fold),
            )
            packed = jax.device_put(packed)
            if tilem:
                if "nxt" in packed:
                    print(f"# tilem=1 requires the folded pack, skipping "
                          f"(fold={fold})", flush=True)
                    continue
                from cloudsc_tpu.kernels.pallas_cloudsc import (
                    pack_to_tile_major,
                )

                packed = jax.jit(
                    lambda p: pack_to_tile_major(p, sb)
                )(packed)
            jax.block_until_ready(packed)
            for mode, skip in ((m, s) for m in a.modes for s in a.skip):
                cfg = SchemeConfig(
                    skip=tuple(x for x in skip.split(",") if x)
                )

                def step(p):
                    return cloudsc_pallas(
                        None, params, inp.ptsphy, sublanes=sb,
                        packed=p, ncol_packed=ncol, _mode=mode,
                        config=cfg,
                        fold_outputs=None if foldo < 0 else bool(foldo),
                    )

                def body(_, fs):
                    out = step(fs)
                    fs = dict(fs)
                    fs["col"] = fs["col"] + 0.0 * \
                        out.prainfrac_toprfz.reshape(1, -1, 128)
                    return fs

                chained = jax.jit(
                    lambda fs: jax.lax.fori_loop(0, a.iters, body, fs)["col"]
                )
                try:
                    t0 = time.perf_counter()
                    _sync(chained(packed))
                    compile_s = time.perf_counter() - t0
                    best = float("inf")
                    for _ in range(4):
                        t0 = time.perf_counter()
                        _sync(chained(packed))
                        best = min(best, time.perf_counter() - t0)
                except Exception as e:
                    print(f"ngptot={ngptot} sb={sb} lps={lps} fold={fold} "
                          f"{mode}: "
                          f"FAILED {type(e).__name__}: {str(e)[:200]}",
                          flush=True)
                    continue
                per_iter = max(best - floor_s, 1e-9) / a.iters
                cols_s = ncol / per_iter
                rec = dict(ngptot=ngptot, sb=sb, lps=lps, mode=mode,
                           order=order, skip=skip,
                           fold=("nxt" not in packed), tilem=bool(tilem),
                           foldo=foldo, foldc=foldc, foldn=foldn,
                           foldd=foldd,
                           ms_per_step=round(per_iter * 1e3, 3),
                           cols_per_s=round(cols_s, 0),
                           compile_s=round(compile_s, 1))
                results.append(rec)
                print(json.dumps(rec), flush=True)

    if a.out:
        Path(a.out).write_text(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
