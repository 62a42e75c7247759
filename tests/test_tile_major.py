"""Tile-major packed layout (CLOUDSC_TILE_MAJOR) — the DMA-contiguity attack.

The standard folded pack streams each Pallas grid step's input as lps*nrows
separate 16 kB contiguous runs (block (lps, nrows, SB, 128) over a
(nlev+1, nrows, nblk, 128) array). pack_to_tile_major reorders the SAME
bytes to (nk2, ni, lps*nrows, SB, 128) so each step's block is ONE
contiguous run (outputs likewise; bench/dma_probe.py measures the synthetic
ceiling, docs/PERFORMANCE.md pre-registers the floor prediction).

The relayout is a pure reshape/transpose of the same values and the physics
body is untouched — only BlockSpec geometry and ref indexing change — so the
kernel must produce BITWISE identical outputs on both layouts.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cloudsc_tpu.data import load_input
from cloudsc_tpu.params import Params
from cloudsc_tpu.physics import cloudsc, make_inputs
from cloudsc_tpu.kernels import cloudsc_pallas
from cloudsc_tpu.kernels.pallas_cloudsc import (
    pack_inputs_raw,
    pack_to_tile_major,
)

from conftest import REFERENCE_DATA as INPUT_PATH

NGPTOT = 512


@pytest.fixture(autouse=True)
def _base_fold_layout(monkeypatch):
    """This module tests the tile-major relayout of the round-4 BASE fold
    contract; pin the curve/newton row extensions off regardless of their
    production defaults (tests/test_satfold.py owns those layouts)."""
    monkeypatch.setenv("CLOUDSC_FOLD_CURVES", "0")
    monkeypatch.setenv("CLOUDSC_FOLD_NEWTON", "0")


@pytest.fixture(scope="module")
def inp_params():
    inp = load_input(INPUT_PATH, ngptot=NGPTOT, expand=False)
    return inp, Params.from_input(inp)


def test_tile_major_bitwise_matches_standard(inp_params):
    """Same folded pack, both layouts, bitwise-equal outputs (interpret)."""
    inp, params = inp_params
    p, ncol = pack_inputs_raw(inp, sublanes=4, params=params,
                              dtype=jnp.float32, fold=True)
    p = jax.device_put(p)
    out_std = cloudsc_pallas(None, params, inp.ptsphy, sublanes=4,
                             interpret=True, packed=p, ncol_packed=ncol)
    tm = jax.jit(lambda q: pack_to_tile_major(q, 4))(p)
    assert tm["pack"].ndim == 5
    out_tm = cloudsc_pallas(None, params, inp.ptsphy, sublanes=4,
                            interpret=True, packed=tm, ncol_packed=ncol)
    for name in out_std._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(out_std, name)),
            np.asarray(getattr(out_tm, name)),
            err_msg=name,
        )


def test_pack_to_tile_major_requires_folded(inp_params):
    inp, params = inp_params
    p, _ = pack_inputs_raw(inp, sublanes=4, params=params,
                           dtype=jnp.float32, fold=False)
    with pytest.raises(ValueError):
        pack_to_tile_major(p, 4)


def test_driver_tile_major_env_plumbing(inp_params, monkeypatch):
    """CLOUDSC_TILE_MAJOR=1 end to end through the driver (interpret mode):
    run() relayouts on device after h2d and agrees with the folded scan
    oracle at the engine bar."""
    from cloudsc_tpu.runtime.driver import CloudscDriver

    inp, params = inp_params
    oracle = jax.jit(
        lambda f: cloudsc(f, params, inp.ptsphy)
    )(make_inputs(inp, dtype=jnp.float32, fold=True))
    monkeypatch.setenv("CLOUDSC_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CLOUDSC_FOLD_INPUTS", "1")
    monkeypatch.setenv("CLOUDSC_TILE_MAJOR", "1")
    d = CloudscDriver(params, inp.ptsphy, dtype=jnp.float32,
                      backend="pallas", sublanes=1)
    assert d.tile_major
    out, _, _ = d.run(inp, iterations=1)
    for name in oracle._fields:
        a = np.asarray(getattr(oracle, name), dtype=np.float64)
        b = np.asarray(getattr(out, name), dtype=np.float64)
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-9, err_msg=name)
