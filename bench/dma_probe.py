"""Synthetic HBM-stream probe — how much of the floor is DMA-shape overhead?

The production kernel's floor (kernel_lab --modes floor) moves ~42 fp32
rows/level/column, but each grid step's input block is (lps, nrows, SB, 128)
over a (nlev, nrows, ncols, 128) array — i.e. lps*nrows separate 16 kB
contiguous runs per DMA, not one big block. At 160K columns the measured
floor (6.01 ms, bench/lab14_fold.log) corresponds to ~630 GB/s, ~77% of a
v5e's HBM peak. This probe measures, with trivial compute and identical
timing methodology, the achievable read+write bandwidth as a function of
DMA contiguity:

  contig<N>   1-D grid; each step copies one fully contiguous N-sublane
              block (N*128*4 bytes) — the pure run-length curve
  strided     the production input shape: block (lps, nrows, SB, 128) over
              (nlev, nrows, nblk, 128), grid (ni, nk2) — 16 kB runs
  tilemajor   the candidate layout: block (1, 1, lps*nrows, SB, 128) over
              (nk2, ni, lps*nrows, SB, 128), grid (ni, nk2) — one contiguous
              ~885 kB run per step, same step count and byte volume as
              `strided`

If contig/tilemajor clear `strided` by more than the session noise, the
packed layout should move to tile-major (docs/PERFORMANCE.md has the
follow-up); if not, the floor is already the platform ceiling and further
stream work is pointless.

Usage:
    python bench/dma_probe.py [--iters 20] [--sb 32] [--lps 3] [--rows 18]
        [--nblk 1280] [--nlev 138]
"""

from __future__ import annotations

import argparse
import functools
import json
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


def _copy_kernel(big_in, col_in, big_out, col_out):
    # multiply (not plain copy) so nothing can elide the traffic; the tiny
    # `col` operand threads the fori_loop dependency exactly like kernel_lab
    big_out[...] = big_in[...] * 1.0000001
    col_out[...] = col_in[...] * 1.0000001


def make_copy(shape_in, block_in, index_in, grid, interpret=False):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    nd = len(grid)
    col_block = pl.BlockSpec((8, 128), lambda *ij: (0,) * 2,
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _copy_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(block_in, index_in, memory_space=pltpu.VMEM),
            col_block,
        ],
        out_specs=[
            pl.BlockSpec(block_in, index_in, memory_space=pltpu.VMEM),
            col_block,
        ],
        out_shape=[
            jax.ShapeDtypeStruct(shape_in, jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) if nd == 1
            else ("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )


def measure(name, shape_in, block_in, index_in, grid, iters, floor_s,
            interpret=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    fn = make_copy(shape_in, block_in, index_in, grid, interpret)
    big = jnp.ones(shape_in, jnp.float32)
    col = jnp.ones((8, 128), jnp.float32)

    def body(_, c):
        b, c2 = fn(big, c)
        return c2

    chained = jax.jit(lambda c: jax.lax.fori_loop(0, iters, body, c))
    try:
        t0 = time.perf_counter()
        _sync(chained(col))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            _sync(chained(col))
            best = min(best, time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001 — record lowering failures, move on
        rec = dict(name=name, failed=f"{type(e).__name__}: {str(e)[:200]}")
        print(json.dumps(rec), flush=True)
        return rec
    per_iter = max(best - floor_s, 1e-9) / iters
    nbytes = int(np.prod(shape_in)) * 4 * 2  # read + write
    rec = dict(
        name=name, grid=list(grid), block=list(block_in),
        bytes_per_iter=nbytes, ms_per_iter=round(per_iter * 1e3, 3),
        gb_per_s=round(nbytes / per_iter / 1e9, 1),
        compile_s=round(compile_s, 1),
    )
    print(json.dumps(rec), flush=True)
    return rec


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--sb", type=int, default=32)
    p.add_argument("--lps", type=int, default=3)
    p.add_argument("--rows", type=int, default=18)
    p.add_argument("--nblk", type=int, default=1280,
                   help="column sublanes total (ncols/128); 1280 = 160K cols")
    p.add_argument("--nlev", type=int, default=138)
    p.add_argument("--contig", type=int, nargs="+",
                   default=[32, 128, 512, 1728, 4096],
                   help="sublane counts for the contiguous run-length curve "
                        "(x128 lanes x4 B: 32 -> 16 kB ... 4096 -> 2 MB)")
    p.add_argument("--only", nargs="+", default=None,
                   help="subset of probes to run (contig/strided/tilemajor)")
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--out", default=None)
    a = p.parse_args()

    floor_s = 0.0 if a.interpret else _dispatch_floor()
    print(f"# dispatch floor: {floor_s * 1e3:.2f} ms", flush=True)

    SB, lps, R = a.sb, a.lps, a.rows
    nk2 = a.nlev // lps
    ni = a.nblk // SB
    results = []

    def want(name):
        return a.only is None or any(name.startswith(o) for o in a.only)

    # 1) pure run-length curve at matched total volume (~same as production)
    total_sub = nk2 * ni * lps * R * SB  # sublanes in the production stream
    for cs in a.contig:
        if not want("contig"):
            break
        nsteps = max(1, total_sub // cs)
        results.append(measure(
            f"contig{cs}", (nsteps, cs, 128), (1, cs, 128),
            lambda i: (i, 0, 0), (nsteps,), a.iters, floor_s, a.interpret,
        ))

    # 2) the production input pattern: 16 kB runs, 2-D grid
    if want("strided"):
        results.append(measure(
            "strided", (nk2 * lps, R, a.nblk, 128), (lps, R, SB, 128),
            lambda i, k: (k, 0, i, 0), (ni, nk2), a.iters, floor_s,
            a.interpret,
        ))

    # 3) candidate tile-major layout: one contiguous run per step, same grid
    if want("tilemajor"):
        results.append(measure(
            "tilemajor", (nk2, ni, lps * R, SB, 128),
            (1, 1, lps * R, SB, 128),
            lambda i, k: (k, i, 0, 0, 0), (ni, nk2), a.iters, floor_s,
            a.interpret,
        ))

    if a.out:
        Path(a.out).write_text(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
