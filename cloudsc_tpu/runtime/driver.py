"""Driver: orchestrates the CLOUDSC step on device with reference-style timing.

The reference driver loops NPROMA blocks under OpenMP
(ref: src/cloudsc_fortran/cloudsc_driver_mod.F90:129-190); on TPU the block loop
disappears — the whole column batch is one XLA program and NPROMA becomes the
column-padding granularity (lane alignment). Like the GPU variants we report
both device-compute-only and end-to-end (with transfers) timings
(ref: src/cloudsc_cuda/cloudsc/cloudsc_driver.cu:349-..., README.md:311-318),
plus compile time which has no reference analogue.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from ..physics import cloudsc, make_inputs
from .timer import PerformanceTimer, Timings
from .dist import column_mesh, shard_fields, sharded_cloudsc


def sync(out):
    """Force completion of a device computation.

    jax.block_until_ready is not a reliable barrier on every backend (the
    tunneled TPU platform acks before execution finishes), so fetch a small
    output buffer — the transfer can only complete once the whole program has.
    """
    leaves = jax.tree_util.tree_leaves(out)
    smallest = min(leaves, key=lambda x: getattr(x, "size", 0))
    np.asarray(smallest)
    return out


def sync_slice(x):
    """Completion barrier for a single array: fetch ONE element (sliced on
    device, so only bytes for one scalar cross the link). The timed-loop
    barrier — sync() would pull the smallest output leaf, which for the
    chained-timing dependency array is the whole ~MB buffer (~100 ms over
    the ~20 MB/s tunneled link, polluting the measurement)."""
    np.asarray(x[(0,) * (x.ndim - 1)][:1])
    return x


class CloudscDriver:
    def __init__(self, params, ptsphy: float, dtype=None, nproma: int = 128,
                 mesh=None, use_mesh: bool = False, backend: str = "auto",
                 sublanes: int = 32, scheme_config=None):
        import jax.numpy as jnp

        self.params = params
        self.ptsphy = ptsphy
        self.scheme_config = scheme_config
        self.dtype = dtype or jnp.float32
        self.nproma = max(int(nproma), 1)
        self.mesh = mesh if mesh is not None else (column_mesh() if use_mesh else None)
        self.sublanes = sublanes
        self.backend = self._resolve_backend(backend)
        if self.backend == "pallas" and self.dtype == jnp.float64:
            raise ValueError(
                "the Pallas TPU kernel is fp32-only (TPUs have no native "
                "fp64); use --precision fp32 or the scan backend "
                "(the reference's SINGLE/double build split, "
                "ref: parkind1.F90:40-44)"
            )
        # packed storage (the CLOUDSC_PACKED_STORAGE analogue, on by default
        # for the Pallas path: one input DMA per grid step)
        self.packed = (
            self.backend == "pallas"
            and os.environ.get("CLOUDSC_PACKED_STORAGE", "1") != "0"
        )
        # packed-closure scan (CLOUDSC_SCAN_PACKED=1, xla backend): prepare()
        # pre-stacks the scan closure ONCE (physics.cloudsc.scan_pack) so the
        # step issues 5 dynamic-slices per level instead of ~40 — without the
        # per-iteration stack rebuild that made the in-step variant lose
        # (bench/lab18_scanpack.log)
        self.scan_packed = (
            self.backend == "xla" and self.mesh is None
            and os.environ.get("CLOUDSC_SCAN_PACKED", "0") == "1"
        )
        # folded packed layout (CLOUDSC_FOLD_INPUTS): the section-1 state
        # accumulation + always-summed input pairs fold at load time (fp64,
        # file width), cutting the kernel's streamed input rows ~1/3
        # (kernels/pallas_cloudsc._PACK_ROWS_F)
        from ..kernels.pallas_cloudsc import fold_enabled, tile_major_enabled

        self.folded = self.packed and fold_enabled()
        # tile-major relayout of the folded pack (CLOUDSC_TILE_MAJOR): each
        # grid step's DMA is one contiguous run instead of lps*nrows 16 kB
        # runs — applied on device after h2d; on a mesh every device
        # relayouts its own shard (dist.tile_major_packed, zero collectives),
        # matching the reference where packed storage is orthogonal to MPI
        # (ref: cloudsc_field_state_mod.F90:29-59)
        self.tile_major = self.folded and tile_major_enabled()
        # activity-grouped column layout (default on, CLOUDSC_GROUP_COLUMNS=0
        # reverts): expand each snapshot column's copies contiguously so the
        # kernel's column tiles are homogeneous and the value-exact per-tile
        # dynamic skips fire at per-column granularity (docs/PERFORMANCE.md).
        # A pure permutation — run() gathers outputs back to canonical order
        # (on a mesh the gather crosses shards, but sits outside the timed
        # loop). Multi-process runs keep the cyclic layout: the inverse
        # gather would index a non-addressable global array per host.
        self.grouped = (
            self.packed
            and jax.process_count() == 1
            and os.environ.get("CLOUDSC_GROUP_COLUMNS", "1") != "0"
        )
        # activity sorting of the grouped layout (CLOUDSC_GROUP_SORT=0
        # reverts to plain source order): order the source columns by a host
        # heuristic of their guard activity so tiles cluster similar-activity
        # columns (data.expand.activity_perm) — still a pure permutation
        self.group_sort = (
            self.grouped
            and os.environ.get("CLOUDSC_GROUP_SORT", "1") != "0"
        )
        self._group_perm = None
        # interpret-mode escape hatch so the packed/pallas driver glue is
        # testable on CPU (tests/test_grouped_columns.py); never set on TPU
        self.interpret = (
            os.environ.get("CLOUDSC_PALLAS_INTERPRET", "0") == "1"
        )
        kw = dict(sublanes=sublanes) if self.backend == "pallas" else {}
        kw["config"] = scheme_config
        if self.mesh is not None and self.packed:
            from .dist import sharded_cloudsc_packed

            self._fn = sharded_cloudsc_packed(params, ptsphy, self.mesh,
                                              sublanes=sublanes,
                                              config=scheme_config,
                                              interpret=self.interpret)
        elif self.mesh is not None:
            self._fn = sharded_cloudsc(params, ptsphy, self.mesh,
                                       backend=self.backend, **kw)
        elif self.packed:
            self._fn = None  # built per column count in fn_for()
            self._fn_cache = {}
        elif self.backend == "pallas":
            from ..kernels import cloudsc_pallas
            self._fn = jax.jit(
                lambda f: cloudsc_pallas(f, params, ptsphy, sublanes=sublanes,
                                         config=scheme_config,
                                         interpret=self.interpret)
            )
        else:
            self._fn = jax.jit(
                lambda f: cloudsc(f, params, ptsphy, config=scheme_config)
            )

    def fn_for(self, ncol: int):
        """The jitted step for payloads prepared by prepare()."""
        if not self.packed or self.mesh is not None:
            return self._fn
        fn = self._fn_cache.get(ncol)
        if fn is None:
            from ..kernels import cloudsc_pallas

            fn = jax.jit(
                lambda p: cloudsc_pallas(
                    None, self.params, self.ptsphy, sublanes=self.sublanes,
                    packed=p, ncol_packed=ncol, config=self.scheme_config,
                    interpret=self.interpret,
                )
            )
            self._fn_cache[ncol] = fn
        return fn

    def _resolve_backend(self, backend: str) -> str:
        """'auto' picks the fused Pallas kernel on TPU (fp32, default scheme
        config) and the XLA scan elsewhere — the analogue of the reference
        selecting its gpu-scc-k-caching vs fortran driver per platform."""
        if backend != "auto":
            if backend not in ("xla", "pallas"):
                raise ValueError(
                    f"unknown backend {backend!r}; use 'auto', 'xla' or 'pallas'"
                )
            return backend
        from ..kernels import pallas_supported

        import jax.numpy as jnp
        # gate strictly on the TPU backend: on CUDA/ROCm/METAL JAX installs the
        # Mosaic kernel cannot lower, so 'auto' must fall back to the XLA scan
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu and self.dtype == jnp.float32 and pallas_supported(
                self.params, self.scheme_config):
            return "pallas"
        return "xla"

    # -- helpers ---------------------------------------------------------------

    def _pad_multiple(self) -> int:
        """Pad columns to a multiple of NPROMA and, on a mesh, of its size."""
        mult = self.nproma
        if self.mesh is not None:
            mult = int(np.lcm(mult, self.mesh.devices.size))
        return mult

    def prepare(self, inp) -> tuple[dict, int]:
        """InputData -> device-ready payload (+ true column count).

        Packed mode returns the packed-storage pytree (pack once, outside the
        hot loop — the FIELD-API buffer build analogue); otherwise the padded
        field dict."""
        ncol = inp.ngptot
        if self.packed:
            from ..kernels.pallas_cloudsc import pack_inputs_raw

            # pack on HOST (the field dict and the pack must never coexist
            # in HBM — the transient exhausts memory above ~200K columns),
            # fusing expansion+cast+pack in one native pass when available
            # on a mesh, pad so every device's shard is a whole tile
            gran = self.sublanes
            if self.mesh is not None:
                gran *= int(self.mesh.devices.size)
            self._group_perm = None
            if self.group_sort:
                from ..data.expand import activity_perm

                klon = int(np.asarray(inp.fields["PT"]).shape[-1])
                if klon < ncol:  # identity layout otherwise
                    self._group_perm = activity_perm(
                        inp.fields["PCLV"], inp.fields["TENDENCY_TMP_CLD"],
                        inp.ptsphy, self.params.ydecldp.rlmin,
                        nshards=(self.mesh.devices.size
                                 if self.mesh is not None else 1),
                    )
            packed, _ = pack_inputs_raw(
                inp, gran, self.params, self.scheme_config, dtype=self.dtype,
                column_order="grouped" if self.grouped else "cyclic",
                column_perm=self._group_perm, fold=self.folded,
            )
            return packed, ncol
        fields = make_inputs(inp, dtype=self.dtype)
        mult = self._pad_multiple()
        target = -(-ncol // mult) * mult
        if target != ncol:
            padded = {}
            for k, v in fields.items():
                pad = [(0, 0)] * (v.ndim - 1) + [(0, target - ncol)]
                padded[k] = jax.numpy.pad(v, pad)
            fields = padded
        if self.scan_packed:
            # pack once, on device, outside any timed loop (the scan
            # analogue of the Pallas pack above)
            from ..physics.cloudsc import scan_pack

            fields = jax.jit(
                lambda f: scan_pack(f, self.params, self.ptsphy,
                                    self.scheme_config)
            )(fields)
        return fields, ncol

    def _ungroup(self, out, inp, ncol: int):
        """Gather grouped-layout outputs back to canonical column order.

        Copies of a snapshot column are bitwise-identical through the scheme
        (columns are independent; the dynamic skips are value-exact), so
        indexing with group_inverse reconstructs the cyclic-layout outputs
        exactly (tests/test_grouped_columns.py)."""
        from ..data.expand import group_inverse

        klon = int(np.asarray(inp.fields["PT"]).shape[-1])
        if klon == ncol:
            return out
        inv = jax.numpy.asarray(
            group_inverse(klon, ncol, perm=self._group_perm)
        )
        return jax.tree.map(lambda a: a[..., inv], out)

    # -- execution ---------------------------------------------------------------

    def chained_fn(self, ncol: int, iterations: int):
        """`iterations` scheme steps chained inside ONE jitted fori_loop.

        Through a tunneled chip every dispatch carries ~30 ms of fixed
        overhead, so timing a Python loop of dispatches measures the tunnel,
        not the device (docs/PERFORMANCE.md methodology). A zero-scaled data
        dependency threads each step's output into the next step's input —
        value-exact, and XLA cannot hoist the loop-invariant step out.
        Returns a jitted fn: payload -> the dependency array (sync target).
        """
        call = self.fn_for(ncol)
        if self.packed:
            def body(_, fs):
                out = call(fs)
                fs = dict(fs)
                # scalar zero-scaled dependency: shape-agnostic (the kernel
                # slices outputs to ncol, which need not be a tile multiple —
                # a full-array reshape against the padded 'col' buffer would
                # fail at trace time for e.g. ngptot=100), still value-exact,
                # and still a real loop-carried data dependency
                fs["col"] = fs["col"] + 0.0 * out.prainfrac_toprfz.ravel()[0]
                return fs

            dep = "col"
        elif self.scan_packed:
            def body(_, fs):
                out = call(fs)
                fs = dict(fs)
                # tiny (ncol,) zero buffer consumed by cloudsc() through
                # paph_surf — a real loop-carried dependency that never
                # perturbs values (0.0 * x, then + 0.0 onto positive paph).
                # The threaded output MUST itself depend on paph_surf, or
                # XLA hoists the whole live computation out of the loop and
                # the chain measures one step instead of `iterations`
                # (prainfrac_toprfz is input-only — threading it measured a
                # bogus 10x, bench/lab24_scanprepack.log pairs 1-2).
                # tendency_loc_t's last level depends on paph_surf (s34c
                # zsigk) and on every level's carry chain.
                fs["dep"] = fs["dep"] + 0.0 * out.tendency_loc_t[-1]
                return fs

            dep = "dep"
        else:
            def body(_, fs):
                out = call(fs)
                fs = dict(fs)
                fs["pt"] = fs["pt"] + 0.0 * out.tendency_loc_t
                return fs

            dep = "pt"
        return jax.jit(
            lambda fs: jax.lax.fori_loop(0, iterations, body, fs)[dep]
        )

    def run(self, inp, iterations: int = 1, warmup: bool = True,
            fetch_outputs: bool = True):
        """Run the scheme; returns (outputs, Timings, PerformanceTimer).

        With fetch_outputs=True (default) the outputs come back on host,
        column-sliced, and d2h is timed. Mesh/bench-size callers pass False to
        keep the outputs on device (the reference never gathers field data
        either — validation reduces norms, ref: validate_mod.F90:148-151);
        device-side validation then uses validate.device_field_norms.
        """
        fields, ncol = self.prepare(inp)
        fn = self.fn_for(ncol)
        timings = Timings()

        t0 = time.perf_counter()
        if self.mesh is not None and self.packed:
            from .dist import shard_packed, tile_major_packed

            fields = shard_packed(fields, self.mesh)
            if self.tile_major:
                fields = tile_major_packed(fields, self.mesh, self.sublanes)
        elif self.mesh is not None:
            fields = shard_fields(fields, self.mesh)
        else:
            fields = jax.device_put(fields)
            if self.tile_major:
                # one-time on-device relayout (layout prep outside the hot
                # loop, exactly like the grouped-column permutation): each
                # grid step's DMA becomes one contiguous run
                from ..kernels.pallas_cloudsc import pack_to_tile_major

                fields = jax.jit(
                    lambda p: pack_to_tile_major(p, self.sublanes)
                )(fields)
        jax.block_until_ready(fields)
        timings.h2d_s = time.perf_counter() - t0

        chained = None
        if warmup:
            t0 = time.perf_counter()
            out = sync(fn(fields))
            if iterations > 1:
                # chain the timed loop in one dispatch (per-dispatch tunnel
                # overhead would otherwise dominate the perf table); warm it
                # up here so the timed region sees no compile
                chained = self.chained_fn(ncol, iterations)
                sync_slice(chained(fields))
            timings.compile_s = time.perf_counter() - t0

        # one row per device: SPMD executes the same program on every mesh
        # device, each holding its column shard — the analogue of the
        # reference's per-thread rows (ref: timer_mod.F90:169-187)
        ndev = self.mesh.devices.size if self.mesh is not None else 1
        timer = PerformanceTimer(ndevices=ndev)
        # energy sampling around the hot loop, gated by EC_PMON exactly like
        # the reference (ref: ec_pmon_mod.F90:14-57, driver samples at
        # cloudsc_driver_mod.F90:170-178)
        from .pmon import EnergySampler

        sampler = EnergySampler()
        sampler.start()
        timer.start()
        t0 = time.perf_counter()
        if chained is not None:
            sync_slice(chained(fields))
        else:
            for _ in range(iterations):
                out = fn(fields)
            out = sync(out)
        timings.compute_s = (time.perf_counter() - t0) / iterations
        timer.end()
        timings.energy_line = sampler.stop_and_report()
        # distribute the column count exactly: the first (total % ndev)
        # devices carry one extra column, so the table's TOTAL row sums to
        # the true ncol*iterations (the JUBE scrapes are value-sensitive)
        total_cols = ncol * iterations
        base, extra = divmod(total_cols, ndev)
        for dev in range(ndev):
            timer.log(dev, timings.compute_s * iterations,
                      base + (1 if dev < extra else 0))

        if self.grouped:
            # map grouped-layout outputs back to canonical (cyclic) column
            # order — a pure device-side gather, outside the timed loop just
            # like the reference's validation reload (a production timestep
            # loop would simply keep the grouped layout end to end)
            out = self._ungroup(out, inp, ncol)
        if not fetch_outputs:
            return out, timings, timer
        t0 = time.perf_counter()
        host_out = jax.tree.map(lambda x: np.asarray(x)[..., :ncol], out)
        timings.d2h_s = time.perf_counter() - t0
        return host_out, timings, timer
