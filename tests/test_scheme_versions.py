"""Alternate scheme versions (ref: cloudsc.F90:562-580 switches).

No golden data exists for the non-default configurations (the reference
hardcodes 2/2/1/1), so these tests pin:
  - finiteness and physical sanity of each alternate,
  - that alternates actually change the answer (not silently ignored),
  - scan-vs-Pallas agreement for each configuration (the cross-engine
    consistency test the reference gets from its 14 variants).
"""

import itertools

import jax
import numpy as np
import pytest

from cloudsc_tpu.data import load_input
from cloudsc_tpu.params import Params
from cloudsc_tpu.physics import cloudsc, make_inputs
from cloudsc_tpu.physics.scheme import SchemeConfig
from cloudsc_tpu.kernels import cloudsc_pallas

from conftest import REFERENCE_DATA as INPUT_PATH

ALTERNATES = [
    SchemeConfig(iwarmrain=1),
    SchemeConfig(ievaprain=1),
    SchemeConfig(ievapsnow=2),
    SchemeConfig(idepice=2),
]


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    inp = load_input(INPUT_PATH, ngptot=100)
    params = Params.from_input(inp)
    fields = make_inputs(inp, dtype=jnp.float64)
    default = jax.jit(lambda f: cloudsc(f, params, inp.ptsphy))(fields)
    return inp, params, fields, default


@pytest.mark.parametrize("cfg", ALTERNATES,
                         ids=lambda c: f"w{c.iwarmrain}r{c.ievaprain}"
                                       f"s{c.ievapsnow}d{c.idepice}")
def test_alternate_finite_and_distinct(setup, cfg):
    inp, params, fields, default = setup
    out = jax.jit(lambda f: cloudsc(f, params, inp.ptsphy, config=cfg))(fields)
    changed = False
    for name, arr in out._asdict().items():
        a = np.asarray(arr)
        assert np.isfinite(a).all(), f"{name} not finite under {cfg}"
        if not np.array_equal(a, np.asarray(getattr(default, name))):
            changed = True
    # the reference snapshot produces zero rain flux (all precip is snow),
    # so the rain-evaporation scheme choice legitimately cannot change the
    # answer for this input
    if cfg.ievaprain == 2:
        assert changed, f"{cfg} produced identical outputs to the default"
    # physical sanity: cloud fraction tendency bounded, precip fluxes >= 0
    assert np.asarray(out.pfplsl).min() >= 0.0
    assert np.asarray(out.pfplsn).min() >= 0.0


@pytest.mark.parametrize("cfg", ALTERNATES,
                         ids=lambda c: f"w{c.iwarmrain}r{c.ievaprain}"
                                       f"s{c.ievapsnow}d{c.idepice}")
def test_alternate_pallas_matches_scan(setup, cfg):
    import jax.numpy as jnp

    inp, params, _, _ = setup
    inp512 = load_input(INPUT_PATH, ngptot=512)
    fields = make_inputs(inp512, dtype=jnp.float32)
    ref = jax.jit(
        lambda f: cloudsc(f, params, inp512.ptsphy, config=cfg)
    )(fields)
    out = cloudsc_pallas(fields, params, inp512.ptsphy, sublanes=4,
                         interpret=True, config=cfg)
    for name in ref._fields:
        a = np.asarray(getattr(ref, name), dtype=np.float64)
        b = np.asarray(getattr(out, name), dtype=np.float64)
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        assert err < 1e-5, f"{name}: {err:.2e} under {cfg}"


def test_aerosol_couplings_pallas_matches_scan(setup):
    """Synthetically enable the aerosol couplings (off in the snapshot) and
    check scan-vs-Pallas agreement — exercises the extra streamed fields."""
    import copy

    import jax.numpy as jnp

    inp, params, _, _ = setup
    p2 = copy.deepcopy(params)
    p2.ydecldp.laericesed = True
    p2.ydecldp.laericeauto = True
    p2.ydecldp.laerliqautolsp = True
    p2.ydecldp.laerliqcoll = True
    cfg = SchemeConfig(iwarmrain=1)  # the aerosol CCN branches live here

    inp512 = load_input(INPUT_PATH, ngptot=512)
    fields = dict(make_inputs(inp512, dtype=jnp.float32))
    # the snapshot carries zero aerosol fields (the couplings are off in the
    # reference config) — substitute physically plausible values
    shape = fields["pt"].shape
    fields["pccn"] = jnp.full(shape, 125.0, jnp.float32)      # CCN cm-3
    fields["pnice"] = jnp.full(shape, 1.0e4, jnp.float32)     # IN m-3
    fields["pre_ice"] = jnp.full(shape, 50.0e-6, jnp.float32)  # re [m]
    fields["plcrit_aer"] = jnp.full(shape, 5.0e-4, jnp.float32)
    fields["picrit_aer"] = jnp.full(shape, 2.0e-4, jnp.float32)
    ref = jax.jit(lambda f: cloudsc(f, p2, inp512.ptsphy, config=cfg))(fields)
    for name, arr in ref._asdict().items():
        assert np.isfinite(np.asarray(arr)).all(), name
    out = cloudsc_pallas(fields, p2, inp512.ptsphy, sublanes=4,
                         interpret=True, config=cfg)
    for name in ref._fields:
        a = np.asarray(getattr(ref, name), dtype=np.float64)
        b = np.asarray(getattr(out, name), dtype=np.float64)
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        assert err < 1e-5, f"{name}: {err:.2e}"
