"""DMA/compute overlap probe — does the Mosaic auto-pipeline hide the stream?

Motivation (docs/PERFORMANCE.md, bench/lab21_attrib.log): the production
kernel measures full ~= floor + sum(section deltas) — i.e. the step time
behaves as stream + compute, SERIAL, even though the auto-pipeline
double-buffers. If the pipeline overlapped, full ~= max(floor, compute)
and the metric of record would jump from ~20 M to the ~33 M speed-of-light.

This probe reproduces the production stream shape (tile-major folded pack:
one contiguous (1,1,RR,SB,128) block in + one out per grid step, grid
(ni, nk2), level dim sequential) with a SYNTHETIC compute body whose cost
scales linearly with `--w` (an FMA chain, unfoldable under strict FP), and
measures, for each variant:

    floor     w=0 (pure stream)                         -> stream time S
    resident  constant index maps, compute w            -> compute time C
    full      streaming + compute w                     -> T

  overlap verdict per (variant, w):  T vs  max(S, C)  vs  S + C.

Variants isolate production features that could defeat the pipeliner:
    plain     one in block, one out block (the minimal stream)
    alias     + a second 3-row BlockSpec on the SAME input array (the k+1
              lookahead used by the folded pack)
    scratch   + a 33-row VMEM scratch with a sequential carry (the VMEM
              state rows)
    prod      alias + scratch + a second small per-column output
              (everything the production kernel does, minus physics)
    branchy   plain + the compute wrapped in a DATA-DEPENDENT lax.cond on a
              block statistic (the inert_skip pattern) — does a dynamic
              branch around the body stall the pipeline's prefetch?

Usage:
    python bench/overlap_probe.py [--w 0 4 8 16] [--variants plain prod]
        [--ni 10] [--sb 32] [--rr 114] [--nk2 23] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

LANES = 128


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


def _compute_chain(x, w):
    import jax

    # strict-FP FMA chain: w dependent multiply-adds per element; Mosaic
    # cannot legally fold (x*a+b)*a+b -> x*a^2+(ab+b), so cost is linear in w
    def body(_, v):
        return v * 1.0000001 + 1e-7

    return jax.lax.fori_loop(0, w, body, x, unroll=True) if w else x


def make_fn(variant, mode, w, ni, nk2, rr, sb):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    shape = (nk2, ni, rr, sb, LANES)
    alias = variant in ("alias", "prod")
    scratch = variant in ("scratch", "prod")
    col_out = variant == "prod"
    branchy = variant == "branchy"

    if mode == "resident":
        big_ix = lambda i, k: (0, 0, 0, 0, 0)
        look_ix = lambda i, k: (0, 0, 0, 0, 0)
    else:
        big_ix = lambda i, k: (k, i, 0, 0, 0)
        look_ix = lambda i, k: (jnp.minimum(k + 1, nk2 - 1), i, 0, 0, 0)

    def kernel(*refs):
        r = list(refs)
        big_in = r.pop(0)
        look_in = r.pop(0) if alias else None
        col_in = r.pop(0)
        big_out = r.pop(0)
        colo = r.pop(0) if col_out else None
        col2 = r.pop(0)
        scr = r.pop(0) if scratch else None

        x = big_in[...]
        if branchy:
            # inert_skip shape: scalar-predicate lax.cond around the body,
            # predicate a reduction of the block (always True on ones input)
            pred = jnp.max(x[0, 0, 0]) > 0.5
            x = jax.lax.cond(
                pred, lambda v: _compute_chain(v, w), lambda v: v, x
            )
        else:
            x = _compute_chain(x, w)
        if scratch:
            # sequential carry across the level dim, like the VMEM state rows
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                scr[...] = jnp.zeros_like(scr)

            acc = scr[...] + x[0, 0, :33] * 1e-8
            scr[...] = acc
            # no scatter on Mosaic: rebuild the row dim by concatenation
            x = jnp.concatenate(
                [x[:, :, :33] + (acc * 1e-9)[None, None], x[:, :, 33:]],
                axis=2,
            )
        if alias:
            x = jnp.concatenate(
                [x[:, :, :3] + look_in[...] * 1e-9, x[:, :, 3:]], axis=2
            )
        big_out[...] = x
        if col_out:
            colo[...] = x[0, 0, 0] * 1.0000001
        col2[...] = col_in[...] * 1.0000001

    in_specs = [pl.BlockSpec((1, 1, rr, sb, LANES), big_ix,
                             memory_space=pltpu.VMEM)]
    n_in = 1
    if alias:
        in_specs.append(pl.BlockSpec((1, 1, 3, sb, LANES), look_ix,
                                     memory_space=pltpu.VMEM))
        n_in += 1
    col_spec = pl.BlockSpec((8, 128), lambda i, k: (0, 0),
                            memory_space=pltpu.VMEM)
    in_specs.append(col_spec)

    out_specs = [pl.BlockSpec((1, 1, rr, sb, LANES), big_ix,
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct(shape, jnp.float32)]
    if col_out:
        out_specs.append(pl.BlockSpec((sb, LANES), lambda i, k: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((ni * sb, LANES), jnp.float32))
    out_specs.append(col_spec)
    out_shape.append(jax.ShapeDtypeStruct((8, 128), jnp.float32))

    scratch_shapes = [pltpu.VMEM((33, sb, LANES), jnp.float32)] if scratch \
        else []

    return pl.pallas_call(
        kernel,
        grid=(ni, nk2),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )


def measure(variant, mode, w, ni, nk2, rr, sb, iters, floor_s):
    import jax
    import jax.numpy as jnp

    fn = make_fn(variant, mode, w, ni, nk2, rr, sb)
    big = jnp.ones((nk2, ni, rr, sb, LANES), jnp.float32)
    col = jnp.ones((8, 128), jnp.float32)

    def body(_, c):
        outs = fn(big, c) if variant not in ("alias", "prod") else \
            fn(big, big, c)
        return outs[-1]

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
        rec = dict(variant=variant, mode=mode, w=w,
                   failed=f"{type(e).__name__}: {str(e)[:200]}")
        print(json.dumps(rec), flush=True)
        return rec
    per_iter = max(best - floor_s, 1e-9) / iters
    nbytes = nk2 * ni * rr * sb * LANES * 4 * 2
    rec = dict(variant=variant, mode=mode, w=w,
               ms_per_iter=round(per_iter * 1e3, 3),
               gb_per_s=round(nbytes / per_iter / 1e9, 1),
               compile_s=round(compile_s, 1))
    print(json.dumps(rec), flush=True)
    return rec


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--w", type=int, nargs="+", default=[0, 4, 8, 16])
    p.add_argument("--variants", nargs="+",
                   default=["plain", "alias", "scratch", "prod"])
    p.add_argument("--ni", type=int, default=10)
    p.add_argument("--nk2", type=int, default=23)
    p.add_argument("--rr", type=int, default=114)
    p.add_argument("--sb", type=int, default=32)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--out", default=None)
    a = p.parse_args()

    floor_s = _dispatch_floor()
    print(f"# dispatch floor: {floor_s * 1e3:.2f} ms", flush=True)
    results = []
    for variant in a.variants:
        for w in a.w:
            # floor (w=0 full), resident (compute only), full
            if w == 0:
                results.append(measure(variant, "full", 0, a.ni, a.nk2,
                                       a.rr, a.sb, a.iters, floor_s))
                continue
            for mode in ("resident", "full"):
                results.append(measure(variant, mode, w, a.ni, a.nk2,
                                       a.rr, a.sb, a.iters, floor_s))
    if a.out:
        Path(a.out).write_text(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
