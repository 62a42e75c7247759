"""Fused Pallas kernel vs the XLA scan oracle (interpret mode on CPU).

The kernel shares its physics body (scheme.level_init / level_step) with the
scan path, so the fp64 golden tests already guard the numerics; these tests
guard the kernel's *schedule* — carry handling across the sequential level
grid, section-8 flux accumulation, NCLDTOP masking, and column padding.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cloudsc_tpu.data import load_input
from cloudsc_tpu.params import Params
from cloudsc_tpu.physics import cloudsc, make_inputs
from cloudsc_tpu.kernels import cloudsc_pallas

NGPTOT = 512  # one (4-sublane, 128-lane) grid row -> fast in interpret mode


from conftest import REFERENCE_DATA as INPUT_PATH


@pytest.fixture(scope="module")
def oracle_pair():
    inp = load_input(INPUT_PATH, ngptot=NGPTOT)
    params = Params.from_input(inp)
    fields = make_inputs(inp, dtype=jnp.float32)
    ref = jax.jit(lambda f: cloudsc(f, params, inp.ptsphy))(fields)
    return inp, params, fields, ref


def _compare(ref, out, rtol):
    for name in ref._fields:
        a = np.asarray(getattr(ref, name), dtype=np.float64)
        b = np.asarray(getattr(out, name), dtype=np.float64)
        denom = max(np.abs(a).max(), 1e-30)
        err = np.abs(a - b).max() / denom
        assert err < rtol, f"{name}: maxrel={err:.3e}"


def test_pallas_matches_oracle(oracle_pair):
    inp, params, fields, ref = oracle_pair
    out = cloudsc_pallas(fields, params, inp.ptsphy, sublanes=4, interpret=True)
    _compare(ref, out, rtol=1e-5)


def test_pallas_column_padding(oracle_pair):
    """ncol not a multiple of the tile: pad columns must not leak."""
    inp, params, fields, ref = oracle_pair
    cut = NGPTOT - 96
    fields_c = {k: v[..., :cut] for k, v in fields.items()}
    ref_c = jax.tree.map(lambda a: a[..., :cut], ref)
    out = cloudsc_pallas(fields_c, params, inp.ptsphy, sublanes=4,
                         interpret=True)
    _compare(ref_c, out, rtol=1e-5)


def test_pallas_sublane_invariance(oracle_pair):
    """Results are identical for different column tile sizes (the NPROMA
    invariance property, ref: ctest sweeps over NPROMA)."""
    inp, params, fields, _ = oracle_pair
    a = cloudsc_pallas(fields, params, inp.ptsphy, sublanes=4, interpret=True)
    b = cloudsc_pallas(fields, params, inp.ptsphy, sublanes=2, interpret=True)
    for name in a._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name,
        )


@pytest.mark.parametrize("sb,lps", [(4, 2), (4, 3), (2, 6), (4, 23)])
def test_packed_sweep_configs_smoke(oracle_pair, sb, lps, monkeypatch):
    """Every level-blocking shape the TPU measurement session sweeps
    (scripts/tpu_session.sh; lps must divide nlev+1=138) must run in
    interpret mode, so a Python-level bug in an untried (SB, lps) config
    cannot waste a scarce TPU window. CLOUDSC_PALLAS_LPS is pinned BEFORE
    packing — the pack's pad-row decision must agree with the kernel's
    level blocking (see bench/kernel_lab.py)."""
    inp, params, fields, ref = oracle_pair
    monkeypatch.setenv("CLOUDSC_PALLAS_LPS", str(lps))
    out = cloudsc_pallas(fields, params, inp.ptsphy, sublanes=sb,
                         packed=True, interpret=True)
    _compare(ref, out, rtol=1e-5)


def test_pallas_supported_guard(monkeypatch, input_100, params):
    """The `auto` dispatch guard: a SchemeConfig whose kernel fails to lower
    must select the scan engine at dispatch, not crash inside the first
    jitted call (the probe traces+lowers a tiny abstract shape, cached)."""
    import jax

    from cloudsc_tpu.kernels import pallas_cloudsc as pc
    from cloudsc_tpu.runtime.driver import CloudscDriver

    monkeypatch.setattr(pc, "_PROBE_CACHE", {})

    def boom(*a, **k):
        raise ValueError("hypothetical unsupported config")

    monkeypatch.setattr(pc, "cloudsc_pallas", boom)
    assert pc.pallas_supported(params) is False
    # cached: a second call must not re-probe (boom would raise visibly if
    # the cache missed — same args, same key)
    assert pc.pallas_supported(params) is False

    # the driver's auto dispatch honors the verdict even "on TPU"
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    import jax.numpy as jnp

    drv = CloudscDriver(params, input_100.ptsphy, dtype=jnp.float32,
                        backend="auto")
    assert drv.backend == "xla"

    # kill switch for measurement sessions: probe skipped, optimistic True
    monkeypatch.setenv("CLOUDSC_PALLAS_PROBE", "0")
    monkeypatch.setattr(pc, "_PROBE_CACHE", {})
    assert pc.pallas_supported(params) is True
