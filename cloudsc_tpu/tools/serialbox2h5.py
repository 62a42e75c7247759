"""Serialbox archive -> HDF5 mirror converter.

Equivalent of the reference's serialbox2hdf5 tool
(ref: serialbox2hdf5/serialbox2hdf5.py:25-96): reads a raw Serialbox archive
(data/*.dat + MetaData-*.json), writes <name>.h5 with fields in the
level-major (lev, col) layout and global scalars as shape-(1,) datasets, then
verifies the round trip.

Usage:
    python -m cloudsc_tpu.tools.serialbox2h5 /root/reference/data input.h5 \
        [--prefix input]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def convert(directory: str, out_path: str, prefix: str = "input",
            verify: bool = True) -> int:
    from ..data.io import write_h5
    from ..data.serialbox import load_input_archive

    fields, scalars = load_input_archive(directory, prefix)
    write_h5(out_path, fields, scalars)
    print(f"wrote {len(fields)} fields + {len(scalars)} scalars -> {out_path}")

    if verify:  # re-read and compare (ref: serialbox2hdf5.py:60-77)
        import h5py

        with h5py.File(out_path, "r") as f:
            for name, arr in fields.items():
                back = np.asarray(f[name])
                if not np.array_equal(back, np.asarray(arr)):
                    print(f"VERIFY FAILED for field {name}", file=sys.stderr)
                    return 1
            for name, val in scalars.items():
                back = np.asarray(f[name])[0]
                if back != val and not (
                    isinstance(val, float) and np.isclose(back, val)
                ):
                    print(f"VERIFY FAILED for scalar {name}", file=sys.stderr)
                    return 1
        print("verify pass: OK")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="serialbox2h5",
        description="Convert a Serialbox CLOUDSC archive to an HDF5 mirror",
    )
    p.add_argument("directory", help="Serialbox archive dir (data/)")
    p.add_argument("output", help="output .h5 path")
    p.add_argument("--prefix", default="input",
                   help="archive prefix (default: input)")
    p.add_argument("--no-verify", action="store_true")
    a = p.parse_args(argv)
    return convert(a.directory, a.output, a.prefix, verify=not a.no_verify)


if __name__ == "__main__":
    sys.exit(main())
