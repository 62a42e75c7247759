"""Reader for the reference Serialbox "Binary" archives (data/*.dat + MetaData JSON).

The reference stores the 100-column x 137-level IFS snapshot as raw column-major
binary dumps, one file per field, with shapes/dtypes described in
MetaData-<prefix>.json (ref: data/ArchiveMetaData-input.json "archive_name": "Binary";
field dims in data/MetaData-input.json). The HDF5 mirrors used by most variants are
produced by transposing >1-D fields to C order (ref: serialbox2hdf5/serialbox2hdf5.py:35-48).

This module reads the raw archives directly (no Serialbox dependency) and returns
numpy arrays in the same layout as the HDF5 mirrors: reversed dims, C order, i.e.
(lev, col) for 2-D fields and (nclv, lev, col) for 3-D fields.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

_ELEMENT_DTYPES = {
    ("int", 4): np.int32,
    ("int", 8): np.int64,
    ("bool", 1): np.bool_,
    ("double", 8): np.float64,
    ("float", 4): np.float32,
}


class SerialboxArchive:
    """A read-only view over one Serialbox binary archive (one savepoint)."""

    def __init__(self, directory: str | Path, prefix: str):
        self.directory = Path(directory)
        self.prefix = prefix
        meta_path = self.directory / f"MetaData-{prefix}.json"
        with open(meta_path) as f:
            self._meta = json.load(f)
        self._field_map = self._meta["field_map"]

    # -- fields ------------------------------------------------------------

    def fieldnames(self) -> list[str]:
        return list(self._field_map.keys())

    def field_dims(self, name: str) -> tuple[int, ...]:
        return tuple(self._field_map[name]["dims"])

    def field_dtype(self, name: str):
        info = self._field_map[name]["meta_info"]
        elem = info["__elementtype"]["value"]
        nbytes = info["__bytesperelement"]["value"]
        return _ELEMENT_DTYPES[(elem, nbytes)]

    def read(self, name: str,
             col_slice: tuple[int, int] | None = None) -> np.ndarray:
        """Read a field; returns HDF5-mirror layout (reversed dims, C order).

        `col_slice=(start, count)` reads only those columns (Serialbox dim 0)
        — the per-rank hyperslab read of the reference
        (ref: file_io_mod.F90:158-235); a memmap keeps the untouched columns
        off the heap."""
        dims = self.field_dims(name)
        dtype = self.field_dtype(name)
        path = self.directory / f"{self.prefix}_{name}.dat"
        n = int(np.prod(dims))
        if path.stat().st_size != n * np.dtype(dtype).itemsize:
            raise ValueError(
                f"{path}: expected {n} elements for dims {dims}"
            )
        if col_slice is None:
            arr = np.fromfile(path, dtype=dtype).reshape(dims, order="F")
        else:
            start, count = col_slice
            mm = np.memmap(path, dtype=dtype, mode="r", shape=tuple(dims),
                           order="F")
            arr = np.array(mm[start:start + count])
        # Serialbox stores column-major; reshape in Fortran order then transpose
        # to C order with reversed dims (matches serialbox2hdf5.py:36-39).
        if arr.ndim > 1:
            arr = np.ascontiguousarray(arr.transpose())
        return arr

    # -- global scalars ------------------------------------------------------

    def global_scalars(self) -> dict:
        """All global metainfo entries as native Python values."""
        out = {}
        for key, rec in self._meta["global_meta_info"].items():
            out[key] = rec["value"]
        return out


def load_input_archive(directory: str | Path, prefix: str = "input",
                       col_slice: tuple[int, int] | None = None
                       ) -> tuple[dict, dict]:
    """Load every field + global scalar from a Serialbox archive directory.

    Returns (fields, globals) where fields maps name -> np.ndarray in the
    HDF5-mirror layout and globals maps scalar name -> python value.
    `col_slice` restricts per-column fields (Serialbox dim 0 == KLON) to the
    given (start, count) — parameter tables like RBETA are left whole.
    """
    ar = SerialboxArchive(directory, prefix)
    scalars = ar.global_scalars()
    klon = int(scalars.get("KLON", -1))
    fields = {
        name: ar.read(
            name,
            col_slice if (col_slice is not None
                          and ar.field_dims(name)[0] == klon) else None,
        )
        for name in ar.fieldnames()
    }
    return fields, scalars
