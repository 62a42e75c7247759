"""cloudsc-tpu: a TPU-native implementation of the IFS CLOUDSC cloud microphysics
scheme (the dwarf-p-cloudsc benchmark), built on JAX/XLA/Pallas.

Structure (mirrors the reference component inventory, re-designed TPU-first):
  params        physics parameter structs (ref: src/common/module/yo{mcst,ethf,ecldp,ephli}.F90)
  data          input/reference readers + column expansion (ref: file_io_mod/expand_mod)
  physics       the CLOUDSC scheme as precompute + lax.scan + postcompute
                (ref: src/cloudsc_fortran/cloudsc.F90)
  runtime       drivers, timers, device-mesh distribution (ref: cloudsc_driver_mod,
                timer_mod, cloudsc_mpi_mod)
  validate      golden-file error-norm table (ref: validate_mod.F90)
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes (scheme graphs are large)."""
    import os

    import jax

    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/cloudsc_tpu_xla_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NCLV = 5
# 0-based species indices (ref: src/common/module/yoecldp.F90:86-91, 1-based there)
NCLDQL = 0  # liquid cloud water
NCLDQI = 1  # ice cloud water
NCLDQR = 2  # rain water
NCLDQS = 3  # snow
NCLDQV = 4  # vapour
