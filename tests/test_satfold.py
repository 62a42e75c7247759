"""Folded saturation curves / Newton (CLOUDSC_FOLD_CURVES, CLOUDSC_FOLD_NEWTON).

The overlap verdict (docs/PERFORMANCE.md) showed the fused kernel is
COMPUTE-bound with its HBM stream fully hidden, so input-only per-level
computations can move to load time and ride the stream as extra rows:
section 1's saturation block (9 rows, physics/satfold.curve_rows) and the
3.4b forcing + CUADJTQ (1 row, satfold.newton_zdqs). Like the round-4 input
fold this is an INPUT CONTRACT shared by both engines — make_inputs(
fold_curves/fold_newton) for the scan oracle, pack_inputs_raw under the env
flags for the kernel — so engine-vs-engine agreement stays at the usual
schedule tolerance, and folded-vs-unfolded runs differ pointwise only within
the fp32 noise floor (the fp64 rows are a strictly more accurate single
rounding).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cloudsc_tpu.data import load_input
from cloudsc_tpu.params import Params
from cloudsc_tpu.physics import cloudsc, make_inputs, scheme
from cloudsc_tpu.physics import satfold
from cloudsc_tpu.physics.thermo import (
    foealfa,
    foedem_a,
    foeewm_a,
    foeldcpm_a,
)
from cloudsc_tpu.kernels import cloudsc_pallas
from cloudsc_tpu.kernels.pallas_cloudsc import (
    _pack_rows_f,
    pack_inputs_raw,
)

from conftest import REFERENCE_DATA as INPUT_PATH

NGPTOT = 512


@pytest.fixture(scope="module")
def inp_params():
    inp = load_input(INPUT_PATH, ngptot=NGPTOT, expand=False)
    return inp, Params.from_input(inp)


def _f64(inp, name):
    return np.asarray(inp.fields[name], np.float64)


def test_curve_rows_match_fp64_level_init(inp_params):
    """satfold.curve_rows (numpy) against scheme.level_init (jnp) at fp64 —
    the formula-sync pin. np.exp and XLA exp may differ in the last ulp."""
    inp, params = inp_params
    dt = float(inp.ptsphy)
    c = scheme.derived_consts(params, dt, jnp.float64)
    ztp1 = _f64(inp, "PT") + dt * _f64(inp, "TENDENCY_TMP_T")
    got = satfold.curve_rows(c, ztp1, _f64(inp, "PAP"))

    raw = dict(
        pt=jnp.asarray(_f64(inp, "PT")),
        pq=jnp.asarray(_f64(inp, "PQ")),
        pa=jnp.asarray(_f64(inp, "PA")),
        pap=jnp.asarray(_f64(inp, "PAP")),
        tendency_tmp_t=jnp.asarray(_f64(inp, "TENDENCY_TMP_T")),
        tendency_tmp_q=jnp.asarray(_f64(inp, "TENDENCY_TMP_Q")),
        tendency_tmp_a=jnp.asarray(_f64(inp, "TENDENCY_TMP_A")),
        pclv=[jnp.asarray(_f64(inp, "PCLV")[m]) for m in range(4)],
        tendency_tmp_cld=[
            jnp.asarray(_f64(inp, "TENDENCY_TMP_CLD")[m]) for m in range(4)
        ],
    )
    ini = jax.jit(lambda r: scheme.level_init(r, c))(raw)
    for name in satfold.CURVE_ROWS:
        a = np.asarray(ini[name], np.float64)
        b = np.asarray(got[name], np.float64)
        denom = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / denom < 1e-13, name


def test_newton_zdqs_matches_fp64_formulas(inp_params):
    """satfold.newton_zdqs (numpy) against the scheme's own thermo
    functions evaluated at fp64 with the identical forcing chain
    (scheme.level_step:524-552) — the formula-sync pin for the Newton."""
    inp, params = inp_params
    dt = float(inp.ptsphy)
    c = scheme.derived_consts(params, dt, jnp.float64)
    thf, cst = c.thf, c.cst
    ztp1 = _f64(inp, "PT") + dt * _f64(inp, "TENDENCY_TMP_T")
    pap = _f64(inp, "PAP")
    paph = _f64(inp, "PAPH")
    pmf = _f64(inp, "PMFU") + _f64(inp, "PMFD")
    zhr = _f64(inp, "PHRSW") + _f64(inp, "PHRLW")
    pvervel = _f64(inp, "PVERVEL")
    zqsmix = satfold.curve_rows(c, ztp1, pap)["zqsmix"]
    got = satfold.newton_zdqs(c, ztp1, pap, paph, pmf, zhr, pvervel, zqsmix)

    # jnp mirror of the scheme's block (the consts/functions are the
    # scheme's own; only the array library differs)
    t64, p64, q64 = map(jnp.asarray, (ztp1, pap, zqsmix))
    zdp = jnp.asarray(paph[1:] - paph[:-1])
    zdtdp = c.zrdcp * t64 / p64
    zdpmxdt = zdp * c.zqtmst
    zmfdn2 = jnp.concatenate(
        [jnp.asarray(pmf[1:]), jnp.zeros((1, pmf.shape[1]))], axis=0
    )
    zwtot = jnp.asarray(pvervel) + 0.5 * c.RG * (jnp.asarray(pmf) + zmfdn2)
    zwtot = jnp.minimum(zdpmxdt, jnp.maximum(-zdpmxdt, zwtot))
    zdtdiab = jnp.minimum(
        zdpmxdt * zdtdp, jnp.maximum(-zdpmxdt * zdtdp, jnp.asarray(zhr))
    ) * c.ptsphy
    zdtforc = zdtdp * zwtot * c.ptsphy + zdtdiab
    tloc = jnp.maximum(t64 + zdtforc, 160.0)
    qloc = q64
    zqp = 1.0 / p64
    for _ in range(2):
        alfa_n = foealfa(tloc, thf)
        zqsat = jnp.minimum(foeewm_a(tloc, alfa_n, cst, thf) * zqp, 0.5)
        zcor_n = 1.0 / (1.0 - c.RETV * zqsat)
        zqsat = zqsat * zcor_n
        zcond = (qloc - zqsat) / (
            1.0 + zqsat * zcor_n * foedem_a(tloc, alfa_n, thf)
        )
        tloc = tloc + foeldcpm_a(alfa_n, thf) * zcond
        qloc = qloc - zcond
    want = np.asarray(qloc - q64, np.float64)
    denom = max(np.abs(want).max(), 1e-300)
    assert np.abs(want - got).max() / denom < 1e-10


def _compare(ref, out, rtol):
    for name in ref._fields:
        a = np.asarray(getattr(ref, name), dtype=np.float64)
        b = np.asarray(getattr(out, name), dtype=np.float64)
        denom = max(np.abs(a).max(), 1e-30)
        err = np.abs(a - b).max() / denom
        assert err < rtol, f"{name}: maxrel={err:.3e}"


@pytest.fixture(scope="module")
def folded_fc_oracle32(inp_params):
    """The fp32 scan engine on the SAME folded curves+newton+dep inputs the
    fc/fn/fd pack streams."""
    inp, params = inp_params
    fields = make_inputs(inp, dtype=jnp.float32, fold=True,
                         fold_curves=True, fold_newton=True, fold_dep=True,
                         params=params)
    assert "zqsmix" in fields and "zdqs" in fields and "zdep0" in fields
    return jax.jit(lambda f: cloudsc(f, params, inp.ptsphy))(fields)


@pytest.mark.parametrize("lps", [1, 3])
def test_fc_fn_kernel_matches_oracle(inp_params, folded_fc_oracle32, lps,
                                     monkeypatch):
    """fc+fn+fd pack through the kernel (interpret mode) vs the scan engine
    on the SAME folded inputs: only engine-schedule differences remain."""
    inp, params = inp_params
    monkeypatch.setenv("CLOUDSC_PALLAS_LPS", str(lps))
    monkeypatch.setenv("CLOUDSC_FOLD_CURVES", "1")
    monkeypatch.setenv("CLOUDSC_FOLD_NEWTON", "1")
    monkeypatch.setenv("CLOUDSC_FOLD_DEP", "1")
    p, ncol = pack_inputs_raw(inp, sublanes=4, params=params,
                              dtype=jnp.float32, fold=True)
    assert p["pack"].shape[1] == len(_pack_rows_f(True, True, True))
    out = cloudsc_pallas(None, params, inp.ptsphy, sublanes=4,
                         interpret=True, packed=jax.device_put(p),
                         ncol_packed=ncol)
    _compare(folded_fc_oracle32, out, rtol=1e-5)


def test_single_knob_layouts(inp_params, monkeypatch):
    """Each knob stands alone: the kernel infers the layout from the pack's
    row count and agrees with the scan oracle on the same inputs."""
    inp, params = inp_params
    for fc, fn, fd in ((True, False, False), (False, True, False),
                       (False, False, True), (False, True, True)):
        monkeypatch.setenv("CLOUDSC_FOLD_CURVES", "1" if fc else "0")
        monkeypatch.setenv("CLOUDSC_FOLD_NEWTON", "1" if fn else "0")
        monkeypatch.setenv("CLOUDSC_FOLD_DEP", "1" if fd else "0")
        fields = make_inputs(inp, dtype=jnp.float32, fold=True,
                             fold_curves=fc, fold_newton=fn, fold_dep=fd,
                             params=params)
        oracle = jax.jit(lambda f: cloudsc(f, params, inp.ptsphy))(fields)
        p, ncol = pack_inputs_raw(inp, sublanes=4, params=params,
                                  dtype=jnp.float32, fold=True)
        assert p["pack"].shape[1] == len(_pack_rows_f(fc, fn, fd))
        out = cloudsc_pallas(None, params, inp.ptsphy, sublanes=4,
                             interpret=True, packed=jax.device_put(p),
                             ncol_packed=ncol)
        _compare(oracle, out, rtol=1e-5)


def test_fd_respects_idepice_config(inp_params, monkeypatch):
    """fold_dep folds the deposition FORMULA the config selects (IDEPICE=2
    ice-PSD here): pack, oracle and kernel must all use the same branch —
    a config-less fold would silently bake the default Rotstayn formula."""
    from cloudsc_tpu.physics.scheme import SchemeConfig

    inp, params = inp_params
    cfg = SchemeConfig(idepice=2)
    monkeypatch.setenv("CLOUDSC_FOLD_CURVES", "0")
    monkeypatch.setenv("CLOUDSC_FOLD_NEWTON", "0")
    monkeypatch.setenv("CLOUDSC_FOLD_DEP", "1")
    fields = make_inputs(inp, dtype=jnp.float32, fold=True, fold_dep=True,
                         params=params, config=cfg)
    oracle = jax.jit(
        lambda f: cloudsc(f, params, inp.ptsphy, config=cfg)
    )(fields)
    p, ncol = pack_inputs_raw(inp, sublanes=4, params=params, config=cfg,
                              dtype=jnp.float32, fold=True)
    out = cloudsc_pallas(None, params, inp.ptsphy, sublanes=4, config=cfg,
                         interpret=True, packed=jax.device_put(p),
                         ncol_packed=ncol)
    _compare(oracle, out, rtol=1e-5)


def test_state_clip_matches_level_init(inp_params):
    """satfold._state_clip (numpy) against scheme.level_init's tidy block
    (jnp) at fp64 — the formula-sync pin for the dep fold's in-cloud ice
    seed (zqx/za post-clip must match bitwise; pure selects/adds)."""
    inp, params = inp_params
    dt = float(inp.ptsphy)
    c = scheme.derived_consts(params, dt, jnp.float64)
    ztp1 = _f64(inp, "PT") + dt * _f64(inp, "TENDENCY_TMP_T")
    zqv = _f64(inp, "PQ") + dt * _f64(inp, "TENDENCY_TMP_Q")
    za_in = _f64(inp, "PA") + dt * _f64(inp, "TENDENCY_TMP_A")
    zqx_cld = _f64(inp, "PCLV")[:4] + dt * _f64(inp, "TENDENCY_TMP_CLD")[:4]
    za, zqx = satfold._state_clip(c, zqv, za_in, zqx_cld)
    raw = dict(
        ztp1_in=jnp.asarray(ztp1), zqv_in=jnp.asarray(zqv),
        za_in=jnp.asarray(za_in),
        zqx_cld_in=[jnp.asarray(zqx_cld[m]) for m in range(4)],
        pap=jnp.asarray(_f64(inp, "PAP")),
    )
    ini = jax.jit(lambda r: scheme.level_init(r, c))(raw)
    np.testing.assert_array_equal(np.asarray(ini["za"]), za)
    for m in range(5):
        np.testing.assert_array_equal(np.asarray(ini["zqx"][m]), zqx[m],
                                      err_msg=f"species {m}")


def test_fc_fn_fp64_tight(inp_params, monkeypatch):
    """fp64 fc+fn pack vs the UNFOLDED fp64 scan oracle: with no precision
    cast in play, the only differences are np-vs-XLA last-ulp
    transcendentals and fma contraction — pinned at 1e-9 relative, far
    inside the validation bar (the round-4 fold pins 1e-12; the curves add
    exp/divide reorderings on top)."""
    inp, params = inp_params
    fields = make_inputs(inp, dtype=jnp.float64)
    ref = jax.jit(lambda f: cloudsc(f, params, inp.ptsphy))(fields)
    monkeypatch.setenv("CLOUDSC_FOLD_CURVES", "1")
    monkeypatch.setenv("CLOUDSC_FOLD_NEWTON", "1")
    monkeypatch.setenv("CLOUDSC_FOLD_DEP", "1")
    p, ncol = pack_inputs_raw(inp, sublanes=4, params=params,
                              dtype=jnp.float64, fold=True)
    out = cloudsc_pallas(None, params, inp.ptsphy, sublanes=4,
                         interpret=True, packed=jax.device_put(p),
                         ncol_packed=ncol)
    _compare(ref, out, rtol=1e-9)


def test_driver_fn_default_end_to_end(inp_params, monkeypatch):
    """The PRODUCTION default path (CLOUDSC_FOLD_NEWTON default ON) end to
    end through the driver in interpret mode, against the fn-aware scan
    oracle at the engine bar — pins that the flipped default is what the
    driver actually runs."""
    from cloudsc_tpu.kernels.pallas_cloudsc import fold_newton_enabled
    from cloudsc_tpu.runtime.driver import CloudscDriver

    inp, params = inp_params
    monkeypatch.delenv("CLOUDSC_FOLD_NEWTON", raising=False)
    monkeypatch.delenv("CLOUDSC_FOLD_CURVES", raising=False)
    assert fold_newton_enabled()  # the measured default (lab25)
    oracle = jax.jit(lambda f: cloudsc(f, params, inp.ptsphy))(
        make_inputs(inp, dtype=jnp.float32, fold=True,
                    fold_newton=True, params=params)
    )
    monkeypatch.setenv("CLOUDSC_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CLOUDSC_FOLD_INPUTS", "1")
    d = CloudscDriver(params, inp.ptsphy, dtype=jnp.float32,
                      backend="pallas", sublanes=1)
    out, _, _ = d.run(inp, iterations=1)
    _compare(oracle, out, rtol=1e-5)


def test_fc_fn_does_not_degrade_fp32_accuracy(inp_params):
    """Folded-curves/newton vs plain-fold fp32 runs differ pointwise where
    the more-accurate fp64 rows cross a threshold differently — inherent to
    fp32 (same class as the round-4 fold). Against the fp64 truth the fc/fn
    engine must be statistically no worse."""
    inp, params = inp_params
    ref64 = jax.jit(lambda f: cloudsc(f, params, inp.ptsphy))(
        make_inputs(inp, dtype=jnp.float64)
    )
    outs = {}
    for fcfn in (False, True):
        fields = make_inputs(inp, dtype=jnp.float32, fold=True,
                             fold_curves=fcfn, fold_newton=fcfn,
                             fold_dep=fcfn, params=params)
        outs[fcfn] = jax.jit(lambda f: cloudsc(f, params, inp.ptsphy))(fields)
    worse = []
    for name in ref64._fields:
        t = np.asarray(getattr(ref64, name), np.float64)
        scale = max(np.abs(t).max(), 1e-30)
        p90 = {
            fcfn: np.quantile(
                np.abs(np.asarray(getattr(outs[fcfn], name), np.float64) - t),
                0.9,
            ) / scale
            for fcfn in (False, True)
        }
        floor = 1e-9  # ~8 fp32 ulps of the field scale: below is noise
        if p90[True] > max(2.0 * p90[False], floor):
            worse.append((name, p90[False], p90[True]))
    assert not worse, f"fold_curves/newton degraded fp32 accuracy: {worse}"
