"""Tools: serialbox->h5 converter roundtrip (ref: serialbox2hdf5 verify pass)."""

import os

import numpy as np
import pytest

from cloudsc_tpu.tools.serialbox2h5 import convert
from conftest import REFERENCE_DATA

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DATA),
    reason="raw Serialbox archive not available (h5-mirror checkout)",
)


def test_serialbox2h5_roundtrip(tmp_path):
    out = tmp_path / "input.h5"
    rc = convert(REFERENCE_DATA, str(out), "input", verify=True)
    assert rc == 0

    # the mirror must load identically to the raw archive
    from cloudsc_tpu.data import load_input

    a = load_input(REFERENCE_DATA, ngptot=100)
    b = load_input(str(out), ngptot=100)
    assert a.scalars["KLEV"] == b.scalars["KLEV"]
    for name, arr in a.fields.items():
        np.testing.assert_array_equal(arr, b.fields[name], err_msg=name)
