"""Benchmark entry point — prints ONE JSON line with the metric of record.

Metric (BASELINE.json): grid-points (columns) per second per chip at the
standard dwarf benchmark size 160K columns x 137 levels. vs_baseline compares
against the strongest single-chip reference number: dwarf-cloudsc-gpu-scc-hoist
at ~340 GF/s on one A100 (ref: README.md:283-292), i.e. 340e9 / 124823.29
flops-per-column = 2.724e6 columns/s (flop model ref: timer_mod.F90:26-27).

Methodology: the tunneled single-chip TPU platform has a ~30 ms fixed
per-dispatch overhead, so ITERS iterations are chained inside ONE jitted
fori_loop (each iteration data-depends on the previous output so XLA cannot
elide any) and the dispatch floor — measured with a trivial jitted op — is
subtracted once. This mirrors the reference's isolated-kernel timing (GPU
variants report kernel-only vs loop+transfer, ref: README.md:311-318).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_COLS_PER_S = 340.0e9 / 124823.29  # A100 scc-hoist, ~2.724e6 col/s

LAST_MEASURED_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench", "last_measured.json"
)


def _probe_backend_once(timeout_s: float) -> bool:
    """Try to initialize the default jax backend in a SUBPROCESS.

    The tunneled platform can hang indefinitely inside backend init (even
    `jax.devices()` blocks), so an in-process try/except cannot bound the
    wait — only a subprocess under a hard timeout can. CLOUDSC_BENCH_PROBE_
    PLATFORM forces a platform via jax.config (the plugin overrides the
    JAX_PLATFORMS env var at import, so the config call is required — this
    is also the test hook for simulating an unreachable backend)."""
    code = (
        "import os, jax\n"
        "p = os.environ.get('CLOUDSC_BENCH_PROBE_PLATFORM')\n"
        "if p: jax.config.update('jax_platforms', p)\n"
        "import jax.numpy as jnp\n"
        "jnp.ones((8, 128)).sum().block_until_ready()\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def _backend_available() -> bool:
    """Bounded probe/retry so a tunnel outage yields a structured skip line
    instead of a stack trace (BENCH_r02 recorded a crash as the round's
    metric). Total budget CLOUDSC_BENCH_PROBE_BUDGET seconds (default 180)."""
    budget = float(os.environ.get("CLOUDSC_BENCH_PROBE_BUDGET", "180"))
    per_try = min(90.0, max(5.0, budget)) if budget > 0 else 30.0
    deadline = time.monotonic() + budget
    while True:
        if _probe_backend_once(per_try):
            return True
        if time.monotonic() >= deadline:
            return False
        time.sleep(min(15.0, max(1.0, deadline - time.monotonic())))


def _fold_default_on() -> bool:
    """Whether the CURRENT environment enables the folded packed layout
    (the default lives in kernels/pallas_cloudsc.FOLD_DEFAULT)."""
    try:
        from cloudsc_tpu.kernels.pallas_cloudsc import fold_enabled
        return fold_enabled()
    except Exception:
        return os.environ.get("CLOUDSC_FOLD_INPUTS", "0") == "1"


def _last_measured():
    try:
        with open(LAST_MEASURED_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _record_measurement(payload: dict) -> None:
    try:
        with open(LAST_MEASURED_PATH, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # the stdout line is the metric of record; the file is a cache


def _sync(x):
    """Barrier via a tiny on-device slice fetch (full-array fetches would ride
    the tunnel at ~90 MB per sync and dominate the measurement)."""
    import numpy as np
    return np.asarray(x[(0,) * (x.ndim - 1)][:1])


def _dispatch_floor() -> float:
    """Fixed per-dispatch cost of this platform (tunnel RTT + runtime),
    measured on a tiny array so the probe itself perturbs nothing."""
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


def _measure(backend: str, on_tpu: bool) -> dict:
    """One full measurement with the CURRENT environment (grouping etc. is
    read from env at driver construction). Raises on any compile/lowering
    failure — the caller owns the fallback chain."""
    import jax
    import jax.numpy as jnp

    from cloudsc_tpu.data import default_input_path, load_input
    from cloudsc_tpu.params import Params
    from cloudsc_tpu.runtime.driver import CloudscDriver

    # CLOUDSC_BENCH_MESH=1 shards columns over all visible devices (the
    # weak-scaling measurement mode for pods; per-chip cols/s is reported)
    use_mesh = os.environ.get("CLOUDSC_BENCH_MESH", "0") == "1"
    ndev = len(jax.devices()) if use_mesh else 1
    ngptot = int(os.environ.get(
        "CLOUDSC_BENCH_NGPTOT", (163840 if on_tpu else 8192) * ndev
    ))
    iters = int(os.environ.get("CLOUDSC_BENCH_ITERS", 10 if on_tpu else 2))

    inp = load_input(default_input_path(), ngptot=ngptot, expand=False)
    params = Params.from_input(inp)
    driver = CloudscDriver(params, inp.ptsphy, dtype=jnp.float32, nproma=128,
                           backend=backend, use_mesh=use_mesh)
    fields, ncol = driver.prepare(inp)
    if driver.mesh is not None:
        # the packed pytree shards over the column-BLOCK axis (-2), the field
        # dict over the trailing column axis — mixing them up would "shard"
        # the 128-lane axis
        from cloudsc_tpu.runtime.dist import (
            shard_fields, shard_packed, tile_major_packed,
        )

        sharder = shard_packed if driver.packed else shard_fields
        fields = sharder(fields, driver.mesh)
        if getattr(driver, "tile_major", False):
            # per-shard on-device relayout, outside the timed loop
            fields = tile_major_packed(fields, driver.mesh, driver.sublanes)
    else:
        fields = jax.device_put(fields)
        if getattr(driver, "tile_major", False):
            # one-time on-device relayout, outside the timed loop (layout
            # prep like the grouped permutation; CLOUDSC_TILE_MAJOR)
            from cloudsc_tpu.kernels.pallas_cloudsc import pack_to_tile_major

            fields = jax.jit(
                lambda p: pack_to_tile_major(p, driver.sublanes)
            )(fields)
    jax.block_until_ready(fields)

    # iterations chained in one dispatch with a zero-scaled data dependency
    # (driver.chained_fn — the same path the CLI perf table uses)
    chained = driver.chained_fn(ncol, iters)
    _sync(chained(fields))  # compile + warmup

    floor = _dispatch_floor()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(chained(fields))
        best = min(best, time.perf_counter() - t0)

    per_iter = max(best - floor, 1e-9) / iters
    cols_per_s = ngptot / per_iter / ndev
    mesh_note = f", {ndev}-device mesh" if use_mesh else ""
    layout = "grouped" if driver.grouped else "cyclic"
    if getattr(driver, "folded", False):
        layout += "+fold"
    if getattr(driver, "tile_major", False):
        layout += "+tm"
    try:
        from cloudsc_tpu.kernels.pallas_cloudsc import (
            fold_curves_enabled,
            fold_dep_enabled,
            fold_newton_enabled,
            fold_outputs_enabled,
        )
        if driver.backend == "pallas" and fold_outputs_enabled():
            layout += "+foldo"
        if driver.backend == "pallas" and fold_curves_enabled():
            layout += "+fc"
        if driver.backend == "pallas" and fold_newton_enabled():
            layout += "+fn"
        if driver.backend == "pallas" and fold_dep_enabled():
            layout += "+fd"
    except Exception:
        pass
    return {
        "metric": f"columns/s per chip ({ngptot // 1024}K cols x 137 lev, "
                  f"fp32, {driver.backend} backend{mesh_note})"
        if on_tpu
        else f"columns/s per chip (CPU fallback, {driver.backend})",
        "value": round(cols_per_s, 1),
        "unit": "columns/s",
        "vs_baseline": round(cols_per_s / BASELINE_COLS_PER_S, 4),
        "config": f"{driver.backend}/{layout}",
    }


def main() -> int:
    force_cpu = os.environ.get("CLOUDSC_BENCH_CPU") == "1"
    if not force_cpu and not _backend_available():
        last = _last_measured()
        print(
            json.dumps(
                {
                    "skipped": True,
                    "reason": "tpu_unavailable",
                    "metric": "columns/s per chip (backend unreachable; "
                              "last measured value attached)",
                    "unit": "columns/s",
                    "last_measured": last,
                }
            )
        )
        return 0

    import jax

    if force_cpu:
        # weak-scaling rehearsal on a virtual CPU mesh (the platform plugin
        # overrides JAX_PLATFORMS, so the config update is required)
        jax.config.update("jax_platforms", "cpu")

    from cloudsc_tpu.runtime.dist import initialize_multihost

    initialize_multihost()  # no-op unless a multi-process launcher set env

    on_tpu = jax.default_backend() not in ("cpu",)

    if not on_tpu:
        jax.config.update("jax_enable_x64", False)

    import cloudsc_tpu

    cloudsc_tpu.enable_compilation_cache()

    backend = os.environ.get("CLOUDSC_BENCH_BACKEND", "auto")

    # Fallback chain: the configured run first, then (if it used the grouped
    # Pallas layout) the ungrouped Pallas kernel, then the XLA scan engine.
    # A Mosaic lowering failure in a new kernel body must degrade the metric,
    # never erase it (BENCH_r02 recorded an outage crash as the round's
    # number; a compile crash would be the same failure by another door).
    attempts = [
        ("configured", backend, {}),
        ("pallas_no_newton", backend, {"CLOUDSC_FOLD_NEWTON": "0"}),
        ("pallas_unfolded", backend, {"CLOUDSC_FOLD_INPUTS": "0"}),
        ("pallas_ungrouped", backend,
         {"CLOUDSC_GROUP_COLUMNS": "0", "CLOUDSC_FOLD_INPUTS": "0"}),
        ("scan", "xla", {}),
    ]
    payload = None
    errors = []
    for name, bk, env in attempts:
        if name == "pallas_no_newton":
            try:
                from cloudsc_tpu.kernels.pallas_cloudsc import (
                    fold_newton_enabled,
                )
                fn_on = fold_newton_enabled()
            except Exception:
                fn_on = False
            if backend == "xla" or not fn_on:
                continue  # the newton fold wasn't in play
        if name == "pallas_unfolded" and (
            backend == "xla" or not _fold_default_on()
        ):
            continue  # fold wasn't in play; skip to the next rung
        if name == "pallas_ungrouped" and (
            backend == "xla"
            or os.environ.get("CLOUDSC_GROUP_COLUMNS", "1") == "0"
        ):
            continue  # would replay the configuration that just failed
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            payload = _measure(bk, on_tpu)
            if errors:
                payload["fallback"] = name
                payload["fallback_reason"] = errors[0]
            break
        except Exception as e:  # noqa: BLE001 — any compile/runtime failure
            msg = f"{name}: {type(e).__name__}: {e}"
            errors.append(msg[:500])
            print(f"bench: {name} config failed, trying next: "
                  f"{msg[:200]}", file=sys.stderr)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    if payload is None:
        print(json.dumps({
            "skipped": True,
            "reason": "all_configs_failed",
            "errors": errors,
            "unit": "columns/s",
            "last_measured": _last_measured(),
        }))
        return 0

    print(json.dumps(payload))
    # Cache only the DEFAULT configuration: A/B sweeps with env overrides
    # (backend/size/layout knobs) must not replace the metric-of-record
    # fallback that the outage skip line cites. A knob explicitly set to its
    # default VALUE still counts as the default configuration (advisor r3).
    try:
        from cloudsc_tpu.kernels.pallas_cloudsc import (
            FOLD_CURVES_DEFAULT,
            FOLD_DEFAULT,
            FOLD_DEP_DEFAULT,
            FOLD_NEWTON_DEFAULT,
            FOLD_OUTPUTS_DEFAULT,
            TILE_MAJOR_DEFAULT,
        )
    except Exception:
        FOLD_DEFAULT, FOLD_OUTPUTS_DEFAULT, TILE_MAJOR_DEFAULT = "0", "0", "0"
        FOLD_CURVES_DEFAULT, FOLD_NEWTON_DEFAULT = "0", "0"
        FOLD_DEP_DEFAULT = "0"
    knob_defaults = {
        "CLOUDSC_BENCH_BACKEND": "auto",
        "CLOUDSC_BENCH_NGPTOT": "163840",
        "CLOUDSC_BENCH_MESH": "0",
        "CLOUDSC_GROUP_COLUMNS": "1",
        "CLOUDSC_GROUP_SORT": "1",
        "CLOUDSC_PALLAS_LPS": "6",
        "CLOUDSC_SCHEME_SKIP": "",
        "CLOUDSC_S521_ROUND_SKIP": "0",
        "CLOUDSC_FOLD_INPUTS": FOLD_DEFAULT,
        "CLOUDSC_TILE_MAJOR": TILE_MAJOR_DEFAULT,
        "CLOUDSC_FOLD_OUTPUTS": FOLD_OUTPUTS_DEFAULT,
        "CLOUDSC_FOLD_CURVES": FOLD_CURVES_DEFAULT,
        "CLOUDSC_FOLD_NEWTON": FOLD_NEWTON_DEFAULT,
        "CLOUDSC_FOLD_DEP": FOLD_DEP_DEFAULT,
        "CLOUDSC_SCAN_PACKED": "0",
        "CLOUDSC_SCAN_UNROLL": "",
    }
    default_config = all(
        os.environ.get(k, d) == d for k, d in knob_defaults.items()
    )
    if on_tpu and default_config:
        _record_measurement({**payload, "measured_at": time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime())})
    return 0


if __name__ == "__main__":
    sys.exit(main())
