"""Device-mesh distribution of the column axis.

The reference's entire distributed backend is a thin MPI wrapper used for (a)
splitting columns across ranks at load time and (b) reducing validation norms /
gathering perf rows (ref: src/common/module/cloudsc_mpi_mod.F90). The TPU-native
equivalent:

  * columns are sharded over a 1-D `jax.sharding.Mesh` ("columns" axis); the
    compute path needs NO collectives — XLA SPMD partitions the embarrassingly
    parallel column axis exactly like the reference's MPI column decomposition
    (ref: dwarf_cloudsc.F90:74-77, expand_mod.F90:30-46)
  * validation norms use psum/pmin/pmax inside shard_map — the analogue of
    CLOUDSC_MPI_REDUCE_* (ref: cloudsc_mpi_mod.F90:109-269)
  * multi-host init maps to jax.distributed.initialize
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_AXIS = "columns"


def initialize_multihost():
    """jax.distributed init (the CLOUDSC_MPI_INIT analogue); no-op single host.

    Activated by the standard JAX env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) — the launcher contract of the
    reference's `mpirun -np N binary ...` (ref: cloudsc_mpi_mod.F90:58-95).
    Idempotent: safe to call from every entry point.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    if getattr(jax.distributed, "is_initialized", None) and \
            jax.distributed.is_initialized():
        return
    kw = {}
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if nproc is not None and pid is not None:
        # plain-launcher contract (no SLURM/OMPI auto-detection available)
        kw = dict(coordinator_address=addr, num_processes=int(nproc),
                  process_id=int(pid))
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as e:  # already initialized by the embedding app
        if "already initialized" not in str(e).lower():
            raise


def column_mesh(devices=None) -> Mesh:
    """A 1-D mesh over all (or the given) devices, columns axis only."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (COLUMN_AXIS,))


def _field_spec(ndim: int) -> P:
    """Columns live on the trailing axis of every field array."""
    return P(*([None] * (ndim - 1) + [COLUMN_AXIS]))


def shard_fields(fields: dict, mesh: Mesh) -> dict:
    """Place a field dict on the mesh, sharded over the trailing column axis."""
    out = {}
    for k, v in fields.items():
        sharding = NamedSharding(mesh, _field_spec(np.ndim(v)))
        out[k] = jax.device_put(jnp.asarray(v), sharding)
    return out


def sharded_cloudsc(params, ptsphy: float, mesh: Mesh, backend: str = "xla",
                    **kw):
    """Jitted CLOUDSC whose inputs/outputs are column-sharded over the mesh.

    There is deliberately no shard_map here: the scheme has no cross-column
    dependency, so plain jit + sharding annotations compiles to fully
    partitioned SPMD code with zero collectives (matching the reference, whose
    compute path has no MPI calls either). backend="pallas" runs the fused TPU
    kernel per shard instead of the XLA scan.
    """
    from ..physics import cloudsc

    config = kw.pop("config", None)
    if backend == "pallas":
        from ..kernels import cloudsc_pallas
        compute = lambda f: cloudsc_pallas(f, params, ptsphy, config=config,
                                           **kw)
    else:
        compute = lambda f: cloudsc(f, params, ptsphy, config=config)

    def fn(fields):
        out = compute(fields)
        specs = jax.tree.map(lambda x: _field_spec(x.ndim), out)
        return jax.lax.with_sharding_constraint(
            out, jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
        )

    return jax.jit(fn)


def _packed_spec(ndim: int) -> P:
    """PartitionSpec for one packed buffer. 4-D/3-D buffers shard over the
    column-block axis (axis -2); the 5-D tile-major pack shards over its
    tile axis (axis 1, `ni`) — the same columns, coarser blocks."""
    if ndim == 5:
        return P(None, COLUMN_AXIS, None, None, None)
    return P(*([None] * (ndim - 2) + [COLUMN_AXIS, None]))


def shard_packed(packed: dict, mesh: Mesh) -> dict:
    """Place a packed-storage pytree on the mesh, sharded over the
    column-block axis (axis -2 of every buffer; tile axis for a 5-D
    tile-major pack)."""
    out = {}
    for k, v in packed.items():
        out[k] = jax.device_put(v, NamedSharding(mesh, _packed_spec(v.ndim)))
    return out


def tile_major_packed(packed: dict, mesh: Mesh, sublanes: int) -> dict:
    """Shard-aware tile-major relayout of a folded packed pytree.

    Each device relayouts its OWN column shard (pure local
    reshape/transpose, zero collectives) — valid because the driver pads to
    whole tiles per device (prepare() gran = sublanes x mesh size), so a
    shard's block axis is tile-aligned and the local relayout equals the
    global one restricted to the shard. Packed storage stays orthogonal to
    distribution exactly like the reference's FIELD-API packed option under
    MPI (ref: cloudsc_field_state_mod.F90:29-59). Layout prep outside the
    timed loop, like the grouped-column permutation."""
    from jax import shard_map

    from ..kernels.pallas_cloudsc import pack_to_tile_major

    in_specs = ({k: _packed_spec(v.ndim) for k, v in packed.items()},)
    local = lambda p: pack_to_tile_major(p, sublanes)
    shapes = jax.eval_shape(local, packed)
    out_specs = {k: _packed_spec(s.ndim) for k, s in shapes.items()}
    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    ))(packed)


def sharded_cloudsc_packed(params, ptsphy: float, mesh: Mesh,
                           sublanes: int = 32, config=None,
                           interpret: bool = False,
                           fold_outputs: bool | None = None):
    """The fused Pallas kernel over a column mesh via shard_map.

    pallas_call is a custom call XLA cannot partition, so the packed fast
    path scales with shard_map: each device runs the kernel on its column
    shard; there are no collectives (the reference's compute path has no MPI
    either). Inputs come from `pack_inputs` + `shard_packed`."""
    from ..kernels.pallas_cloudsc import cloudsc_pallas
    from jax import shard_map

    def fn(packed):
        # 5-D tile-major packs shard over the tile axis, everything else
        # over the column-block axis (see _packed_spec)
        in_specs = ({k: _packed_spec(v.ndim) for k, v in packed.items()},)

        def local(p):
            return cloudsc_pallas(
                None, params, ptsphy, sublanes=sublanes, packed=p,
                interpret=interpret, config=config,
                fold_outputs=fold_outputs,
            )

        # probe output structure to build out_specs (columns = trailing axis)
        shapes = jax.eval_shape(local, packed)
        out_specs = jax.tree.map(
            lambda s: P(*([None] * (s.ndim - 1) + [COLUMN_AXIS])), shapes
        )
        return shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )(packed)

    return jax.jit(fn)


# -- cross-process collectives (the CLOUDSC_MPI_REDUCE_*/GATHER analogues) -----

def allreduce_field_norms(norms: np.ndarray) -> np.ndarray:
    """Reduce per-field (min, max, maxerr, errsum, refsum) rows across
    processes — the CLOUDSC_MPI_REDUCE_MIN/MAX/SUM triple the reference
    validator issues per field (ref: validate_mod.F90:148-151), batched into
    one allgather for all fields.

    `norms` is (nfields, 5) float64; returns the same shape, globally reduced.
    Single-process: identity.
    """
    if jax.process_count() == 1:
        return norms
    from jax.experimental import multihost_utils

    g = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(norms))
    )  # (nproc, nfields, 5)
    return np.stack(
        [
            g[..., 0].min(axis=0),
            g[..., 1].max(axis=0),
            g[..., 2].max(axis=0),
            g[..., 3].sum(axis=0),
            g[..., 4].sum(axis=0),
        ],
        axis=-1,
    )


def gather_perf_rows(time_s: float, ncols: int) -> np.ndarray:
    """Gather one (seconds, columns) performance row per process to every
    process — the CLOUDSC_MPI_GATHER the reference timer issues before
    printing per-rank rows (ref: timer_mod.F90:167, cloudsc_mpi_mod.F90:271-329).

    Returns (nprocs, 2) float64.
    """
    row = np.asarray([time_s, float(ncols)])
    if jax.process_count() == 1:
        return row[None, :]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(jnp.asarray(row)))


# -- validation-norm reductions (the CLOUDSC_MPI_REDUCE_* analogues) -----------

def error_norms(field, ref, axis_name: str | None = None):
    """(min, max, maxabserr, errsum, refsum) with optional mesh reduction."""
    diff = jnp.abs(field - ref)
    stats = dict(
        minval=jnp.min(field),
        maxval=jnp.max(field),
        maxerr=jnp.max(diff),
        errsum=jnp.sum(diff),
        refsum=jnp.sum(jnp.abs(ref)),
    )
    if axis_name is not None:
        stats["minval"] = jax.lax.pmin(stats["minval"], axis_name)
        stats["maxval"] = jax.lax.pmax(stats["maxval"], axis_name)
        stats["maxerr"] = jax.lax.pmax(stats["maxerr"], axis_name)
        stats["errsum"] = jax.lax.psum(stats["errsum"], axis_name)
        stats["refsum"] = jax.lax.psum(stats["refsum"], axis_name)
    return stats


def sharded_error_norms(mesh: Mesh, params=None):
    """shard_map'd error norms over the column mesh — the distributed VALIDATE."""
    from jax import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, COLUMN_AXIS), P(None, COLUMN_AXIS)),
        out_specs=P(),
    )
    def norms(field, ref):
        s = error_norms(field, ref, axis_name=COLUMN_AXIS)
        return jnp.stack(
            [s["minval"], s["maxval"], s["maxerr"], s["errsum"], s["refsum"]]
        )

    return norms
