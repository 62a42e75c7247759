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


def test_h52serialbox_roundtrip_bitwise(tmp_path):
    """Write side (ref: serialize_mod.F90:62-130): h5 mirror -> .dat archive.

    The strongest possible check: every regenerated input_*.dat must be
    BITWISE identical to the reference's shipped archive, and the package
    reader must load the regenerated archive identically to the original."""
    import filecmp

    from cloudsc_tpu.data.io import write_h5
    from cloudsc_tpu.data.serialbox import load_input_archive
    from cloudsc_tpu.tools.h52serialbox import convert as h52sbx

    # raw archive -> h5 mirror -> regenerated archive
    mirror = tmp_path / "input.h5"
    fields, scalars = load_input_archive(REFERENCE_DATA, "input")
    write_h5(mirror, fields, scalars)
    out = tmp_path / "archive"
    rc = h52sbx(str(mirror), str(out), "input", verify=True)
    assert rc == 0

    dats = sorted(p.name for p in out.glob("*.dat"))
    assert len(dats) == len(fields)
    for name in dats:
        assert filecmp.cmp(out / name, os.path.join(REFERENCE_DATA, name),
                           shallow=False), f"{name} not bitwise identical"

    # metadata must carry dims/dtypes/scalars faithfully through the reader
    back_fields, back_scalars = load_input_archive(out, "input")
    for name, arr in fields.items():
        assert back_fields[name].dtype == arr.dtype, name
        np.testing.assert_array_equal(back_fields[name], arr, err_msg=name)
    for name, val in scalars.items():
        assert back_scalars[name] == pytest.approx(val), name


def test_h52serialbox_reference_prefix(tmp_path):
    """The goldens archive regenerates too (prefix=reference): the converter
    must handle the output-field set and its 3-D TENDENCY_LOC_CLD layout."""
    import filecmp

    from cloudsc_tpu.data.io import write_h5
    from cloudsc_tpu.data.serialbox import load_input_archive
    from cloudsc_tpu.tools.h52serialbox import convert as h52sbx

    fields, scalars = load_input_archive(REFERENCE_DATA, "reference")
    mirror = tmp_path / "reference.h5"
    write_h5(mirror, fields, scalars)
    out = tmp_path / "archive"
    rc = h52sbx(str(mirror), str(out), "reference", verify=True)
    assert rc == 0
    for p in sorted(out.glob("*.dat")):
        assert filecmp.cmp(p, os.path.join(REFERENCE_DATA, p.name),
                           shallow=False), f"{p.name} not bitwise identical"
