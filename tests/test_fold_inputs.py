"""Folded packed layout (CLOUDSC_FOLD_INPUTS) — load-time input folding.

The scheme never reads the raw state and tendency_tmp fields separately
(section 1 consumes only x + PTSPHY*tend, ref: cloudsc.F90:662-682) and
PMFU/PMFD, PHRSW/PHRLW are only ever consumed summed (ref: 1145, 1288-1289),
so the packed fast path can fold those sums at LOAD time — in fp64 at file
width, a strictly more accurate single rounding — cutting the kernel's
streamed input rows by ~1/3 and eliminating the nxt/paph side buffers
(kernels/pallas_cloudsc._PACK_ROWS_F).

The fold is an INPUT CONTRACT shared by both engines
(make_inputs(fold=True) for the scan, pack_inputs_raw(fold=True) for the
kernel): both consume bitwise-identical folded values, so engine-vs-engine
agreement stays at the usual schedule tolerance. Folded vs UNFOLDED runs
differ legitimately where the 1-ulp initial-state change flips a section-1
clip threshold (zqx < RLMIN) — that sensitivity is inherent to fp32 (the
fp32-vs-fp64 oracle has it too), which is why the cross-fold check below is
statistical: the fold must not DEGRADE fp32 accuracy vs the fp64 truth.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cloudsc_tpu.data import load_input
from cloudsc_tpu.data.expand import group_inverse
from cloudsc_tpu.params import Params
from cloudsc_tpu.physics import cloudsc, make_inputs
from cloudsc_tpu.kernels import cloudsc_pallas
from cloudsc_tpu.kernels.pallas_cloudsc import (
    _PACK_ROWS_F,
    _folded_rows,
    _pack_expand_numpy,
    pack_inputs,
    pack_inputs_raw,
)

from conftest import REFERENCE_DATA as INPUT_PATH

NGPTOT = 512


@pytest.fixture(autouse=True)
def _base_fold_layout(monkeypatch):
    """This module tests the round-4 BASE fold contract; pin the newer
    curve/newton row extensions off regardless of their production
    defaults (tests/test_satfold.py owns those layouts)."""
    monkeypatch.setenv("CLOUDSC_FOLD_CURVES", "0")
    monkeypatch.setenv("CLOUDSC_FOLD_NEWTON", "0")


@pytest.fixture(scope="module")
def inp_params():
    inp = load_input(INPUT_PATH, ngptot=NGPTOT, expand=False)
    return inp, Params.from_input(inp)


@pytest.fixture(scope="module")
def folded_oracle32(inp_params):
    """The fp32 scan engine on the SAME folded inputs the pack streams."""
    inp, params = inp_params
    fields = make_inputs(inp, dtype=jnp.float32, fold=True)
    return jax.jit(lambda f: cloudsc(f, params, inp.ptsphy))(fields)


def _compare(ref, out, rtol):
    for name in ref._fields:
        a = np.asarray(getattr(ref, name), dtype=np.float64)
        b = np.asarray(getattr(out, name), dtype=np.float64)
        denom = max(np.abs(a).max(), 1e-30)
        err = np.abs(a - b).max() / denom
        assert err < rtol, f"{name}: maxrel={err:.3e}"


def test_folded_pack_layout(inp_params):
    """Row order, paph-in-pack (real surface row, not an edge copy), fp64
    single-rounding fold values, and the pytree discriminator."""
    inp, params = inp_params
    f = inp.fields
    p, ncol = pack_inputs_raw(inp, sublanes=4, params=params,
                              dtype=jnp.float32, fold=True)
    assert ncol == NGPTOT
    assert set(p) == {"pack", "col"}  # no nxt/paph side buffers
    nlev = inp.klev
    pack = np.asarray(p["pack"]).reshape(nlev + 1, len(_PACK_ROWS_F), -1)

    klon = np.asarray(f["PT"]).shape[-1]
    dt = float(inp.ptsphy)

    def expanded(a64):  # cyclic expansion of a file-width fp64 row -> fp32
        return np.asarray(a64, np.float32)[..., np.arange(NGPTOT) % klon]

    # paph rides in the pack with its REAL nlev+1-th (surface) row
    r_paph = _PACK_ROWS_F.index("paph")
    np.testing.assert_array_equal(
        pack[nlev, r_paph, :NGPTOT], expanded(np.asarray(f["PAPH"])[nlev])
    )
    # folded state rows are the fp64 sums rounded once
    r_ztp1 = _PACK_ROWS_F.index("ztp1_in")
    want = expanded(np.asarray(f["PT"], np.float64)
                    + dt * np.asarray(f["TENDENCY_TMP_T"], np.float64))
    np.testing.assert_array_equal(pack[5, r_ztp1, :NGPTOT], want[5])
    r_pmf = _PACK_ROWS_F.index("pmf")
    want = expanded(np.asarray(f["PMFU"], np.float64)
                    + np.asarray(f["PMFD"], np.float64))
    np.testing.assert_array_equal(pack[7, r_pmf, :NGPTOT], want[7])
    # per-level rows' pad row is an edge copy (read only under masks)
    r_plu = _PACK_ROWS_F.index("plu")
    np.testing.assert_array_equal(pack[nlev, r_plu], pack[nlev - 1, r_plu])


@pytest.mark.parametrize("grouped", [False, True])
def test_pack_numpy_mirror_matches_native(grouped):
    """_pack_expand_numpy is the native packer's bit-identical fallback —
    folded packs must be deterministic with or without the C++ library."""
    from cloudsc_tpu.native import pack_expand_native

    rng = np.random.default_rng(7)
    srcs = [rng.standard_normal((4, 7)), rng.standard_normal((5, 7)),
            rng.standard_normal((1, 7))]
    ncol, target, nlev_rows = 23, 32, 5
    native = pack_expand_native(srcs, ncol, target, nlev_rows,
                                grouped=grouped)
    if native is None:
        pytest.skip("native library unavailable")
    mirror = _pack_expand_numpy(srcs, ncol, target, nlev_rows, grouped,
                                np.float32)
    np.testing.assert_array_equal(native, mirror)


@pytest.mark.parametrize("lps", [1, 3, 6])
def test_folded_kernel_matches_folded_oracle(inp_params, folded_oracle32,
                                             lps, monkeypatch):
    """Folded pack through the kernel vs the scan engine on the SAME folded
    inputs: only engine-schedule differences remain (the usual bar)."""
    inp, params = inp_params
    monkeypatch.setenv("CLOUDSC_PALLAS_LPS", str(lps))
    p, ncol = pack_inputs_raw(inp, sublanes=4, params=params,
                              dtype=jnp.float32, fold=True)
    out = cloudsc_pallas(None, params, inp.ptsphy, sublanes=4,
                         interpret=True, packed=jax.device_put(p),
                         ncol_packed=ncol)
    _compare(folded_oracle32, out, rtol=1e-5)


def test_fold_does_not_degrade_fp32_accuracy(inp_params):
    """Folded vs unfolded fp32 runs differ pointwise where the single
    rounding flips a clip threshold — inherent to fp32. The guarantee that
    matters: against the fp64 truth, the folded fp32 engine is statistically
    no worse (p90 of |err| per field within 2x, and no worse than 1 ulp at
    the median)."""
    inp, params = inp_params
    ref64 = jax.jit(lambda f: cloudsc(f, params, inp.ptsphy))(
        make_inputs(inp, dtype=jnp.float64)
    )
    outs = {}
    for fold in (False, True):
        fields = make_inputs(inp, dtype=jnp.float32, fold=fold)
        outs[fold] = jax.jit(lambda f: cloudsc(f, params, inp.ptsphy))(fields)
    worse = []
    for name in ref64._fields:
        t = np.asarray(getattr(ref64, name), np.float64)
        scale = max(np.abs(t).max(), 1e-30)
        p90 = {
            fold: np.quantile(
                np.abs(np.asarray(getattr(outs[fold], name), np.float64) - t),
                0.9,
            ) / scale
            for fold in (False, True)
        }
        floor = 1e-9  # ~8 fp32 ulps of the field scale: below is noise
        if p90[True] > max(2.0 * p90[False], floor):
            worse.append((name, p90[False], p90[True]))
    assert not worse, f"fold degraded fp32 accuracy: {worse}"


def test_folded_fp64_tight(inp_params):
    """fp64 folded pack (numpy-mirror path) vs the UNFOLDED fp64 scan
    oracle: with no precision cast in play the fold is value-identical up to
    mul+add vs fma contraction — pinned at 1e-12 relative, far inside the
    golden bar. This also proves the folded LAYOUT (lookahead-from-same-
    array, paph-in-pack, pad rows) is plumbing-exact."""
    inp, params = inp_params
    fields = make_inputs(inp, dtype=jnp.float64)
    ref = jax.jit(lambda f: cloudsc(f, params, inp.ptsphy))(fields)
    p, ncol = pack_inputs_raw(inp, sublanes=4, params=params,
                              dtype=jnp.float64, fold=True)
    out = cloudsc_pallas(None, params, inp.ptsphy, sublanes=4,
                         interpret=True, packed=jax.device_put(p),
                         ncol_packed=ncol)
    _compare(ref, out, rtol=1e-12)


def test_folded_grouped_bitwise_equal_cyclic(inp_params):
    """The group-inverse guarantee holds under the folded layout (the fold
    happens at file width BEFORE expansion, so copies stay bitwise equal)."""
    inp, params = inp_params
    klon = np.asarray(inp.fields["PT"]).shape[-1]
    outs = {}
    for order in ("cyclic", "grouped"):
        p, ncol = pack_inputs_raw(inp, sublanes=1, params=params,
                                  dtype=jnp.float32, column_order=order,
                                  fold=True)
        outs[order] = cloudsc_pallas(None, params, inp.ptsphy, sublanes=1,
                                     interpret=True,
                                     packed=jax.device_put(p),
                                     ncol_packed=ncol)
    inv = group_inverse(klon, NGPTOT)
    regrouped = jax.tree.map(lambda a: a[..., inv], outs["grouped"])
    for name in outs["cyclic"]._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(outs["cyclic"], name)),
            np.asarray(getattr(regrouped, name)), err_msg=name,
        )


@pytest.mark.parametrize("nlev", [68, 91])
def test_folded_at_truncated_level_counts(inp_params, nlev):
    """Folded layout at non-L137 level counts: the nlev+1-row pack and
    paph-in-pack must hold under other lps blockings (69 = 3x23 -> lps 3,
    92 = 4x23 -> lps 2)."""
    from test_level_generality import _truncated

    inp, params = inp_params
    tr = _truncated(inp, nlev)
    ref = jax.jit(lambda f: cloudsc(f, params, tr.ptsphy))(
        make_inputs(tr, dtype=jnp.float32, fold=True)
    )
    p, ncol = pack_inputs_raw(tr, sublanes=4, params=params,
                              dtype=jnp.float32, fold=True)
    out = cloudsc_pallas(None, params, tr.ptsphy, sublanes=4,
                         interpret=True, packed=jax.device_put(p),
                         ncol_packed=ncol)
    assert out.pfplsl.shape == (nlev + 1, ncol)
    _compare(ref, out, rtol=2e-5)


def test_pack_inputs_folded_from_fields(inp_params):
    """The expanded-field-dict fold (pack_inputs) folds in the FIELD dtype;
    its oracle is the scan on the same fp32-folded values (built with the
    same _folded_rows helper)."""
    inp, params = inp_params
    fields = make_inputs(inp, dtype=jnp.float32)
    p, ncol = pack_inputs(fields, sublanes=4, params=params,
                          ptsphy=inp.ptsphy, fold=True)
    out = cloudsc_pallas(None, params, inp.ptsphy, sublanes=4,
                         interpret=True, packed=jax.device_put(p),
                         ncol_packed=ncol)

    def get(name, m=None):
        a = fields[name.lower()]
        return np.asarray(a if m is None else a[m], np.float32)

    fr = _folded_rows(get, np.float32(inp.ptsphy))
    ffields = {
        "ztp1_in": fr["ztp1_in"], "zqv_in": fr["zqv_in"],
        "za_in": fr["za_in"],
        "zqx_cld_in": np.stack([fr[f"zqx{m}_in"] for m in range(4)]),
        "pmf": fr["pmf"], "zhr": fr["zhr"],
        **{k: fields[k] for k in (
            "pvfl", "pvfi", "pvervel", "pap", "paph", "plsm", "ldcum",
            "ktype", "plu", "plude", "psnde", "psupsat", "plcrit_aer",
            "picrit_aer", "pre_ice", "pccn", "pnice",
        )},
    }
    ref = jax.jit(lambda f: cloudsc(f, params, inp.ptsphy))(ffields)
    _compare(ref, out, rtol=1e-5)
    with pytest.raises(ValueError):
        pack_inputs(fields, sublanes=4, params=params, fold=True)


def test_driver_fold_env_plumbing(inp_params, monkeypatch):
    """CLOUDSC_FOLD_INPUTS=1 end to end through the driver (interpret mode):
    prepare() builds the folded pytree and run() agrees with the folded scan
    oracle at the engine bar."""
    from cloudsc_tpu.runtime.driver import CloudscDriver

    inp, params = inp_params
    oracle = jax.jit(
        lambda f: cloudsc(f, params, inp.ptsphy)
    )(make_inputs(inp, dtype=jnp.float32, fold=True))
    monkeypatch.setenv("CLOUDSC_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CLOUDSC_FOLD_INPUTS", "1")
    d = CloudscDriver(params, inp.ptsphy, dtype=jnp.float32,
                      backend="pallas", sublanes=1)
    assert d.folded
    payload, ncol = d.prepare(inp)
    assert "nxt" not in payload
    out, _, _ = d.run(inp, iterations=1)
    _compare(oracle, out, rtol=1e-5)
