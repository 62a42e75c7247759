"""Benchmark entry point — prints ONE JSON line with the metric of record.

Metric (BASELINE.json): grid-points (columns) per second per chip at the
standard dwarf benchmark size 160K columns x 137 levels. vs_baseline compares
against the strongest single-chip reference number: dwarf-cloudsc-gpu-scc-hoist
at ~340 GF/s on one A100 (ref: README.md:283-292), i.e. 340e9 / 124823.29
flops-per-column = 2.724e6 columns/s (flop model ref: timer_mod.F90:26-27).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_COLS_PER_S = 340.0e9 / 124823.29  # A100 scc-hoist, ~2.724e6 col/s


def main() -> int:
    import jax

    on_tpu = jax.default_backend() not in ("cpu",)
    import jax.numpy as jnp

    if not on_tpu:
        jax.config.update("jax_enable_x64", False)

    import cloudsc_tpu

    cloudsc_tpu.enable_compilation_cache()

    from cloudsc_tpu.data import load_input
    from cloudsc_tpu.params import Params
    from cloudsc_tpu.runtime.driver import CloudscDriver, sync

    ngptot = int(os.environ.get("CLOUDSC_BENCH_NGPTOT", 163840 if on_tpu else 8192))
    iters = int(os.environ.get("CLOUDSC_BENCH_ITERS", 10 if on_tpu else 2))
    input_path = os.environ.get("CLOUDSC_INPUT", "/root/reference/data")

    inp = load_input(input_path, ngptot=ngptot)
    params = Params.from_input(inp)
    driver = CloudscDriver(params, inp.ptsphy, dtype=jnp.float32, nproma=128)

    fields, ncol = driver.prepare(inp)
    fields = jax.device_put(fields)
    jax.block_until_ready(fields)
    out = sync(driver._fn(fields))  # compile + warmup

    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = sync(driver._fn(fields))
        best = min(best, time.perf_counter() - t0)

    cols_per_s = ngptot / best
    print(
        json.dumps(
            {
                "metric": "columns/s per chip (160K cols x 137 lev, fp32)"
                if on_tpu
                else "columns/s per chip (CPU fallback)",
                "value": round(cols_per_s, 1),
                "unit": "columns/s",
                "vs_baseline": round(cols_per_s / BASELINE_COLS_PER_S, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
