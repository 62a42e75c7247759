"""Golden-file validation: per-field error norms + the reference's table format.

Reproduces the statistics and stdout format of the reference validator so the
output is directly comparable (and JUBE-parseable):
  per field: min, max, AbsMaxErr, AvgAbsErr/GP, MaxRelErr-%
  with a ' !!!!' flag when the relative error exceeds 10*machine-eps
(ref: src/common/module/validate_mod.F90:263-296; header print
 ref: src/common/module/cloudsc_global_state_mod.F90:296-299).

In a multi-device run the norms are reduced across the mesh with psum/pmin/pmax —
the TPU equivalent of the reference's MPI reductions
(ref: validate_mod.F90:148-151); see runtime/dist.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# validation order and field dimensionality (ref: cloudsc_global_state_mod.F90:324-345)
VALIDATION_ORDER = [
    ("PLUDE", 2), ("PCOVPTOT", 2), ("PRAINFRAC_TOPRFZ", 1),
    ("PFSQLF", 2), ("PFSQIF", 2), ("PFCQLNG", 2), ("PFCQNNG", 2),
    ("PFSQRF", 2), ("PFSQSF", 2), ("PFCQRNG", 2), ("PFCQSNG", 2),
    ("PFSQLTUR", 2), ("PFSQITUR", 2),
    ("PFPLSL", 2), ("PFPLSN", 2), ("PFHPSL", 2), ("PFHPSN", 2),
    ("TENDENCY_LOC%A", 2), ("TENDENCY_LOC%Q", 2), ("TENDENCY_LOC%T", 2),
    ("TENDENCY_LOC%CLD", 3),
]

# output-struct attribute for each validated name
FIELD_ATTR = {
    "PLUDE": "plude", "PCOVPTOT": "pcovptot",
    "PRAINFRAC_TOPRFZ": "prainfrac_toprfz",
    "PFSQLF": "pfsqlf", "PFSQIF": "pfsqif",
    "PFCQLNG": "pfcqlng", "PFCQNNG": "pfcqnng",
    "PFSQRF": "pfsqrf", "PFSQSF": "pfsqsf",
    "PFCQRNG": "pfcqrng", "PFCQSNG": "pfcqsng",
    "PFSQLTUR": "pfsqltur", "PFSQITUR": "pfsqitur",
    "PFPLSL": "pfplsl", "PFPLSN": "pfplsn",
    "PFHPSL": "pfhpsl", "PFHPSN": "pfhpsn",
    "TENDENCY_LOC%A": "tendency_loc_a",
    "TENDENCY_LOC%Q": "tendency_loc_q",
    "TENDENCY_LOC%T": "tendency_loc_t",
    "TENDENCY_LOC%CLD": "tendency_loc_cld",
}

REF_DATASET = {name: name.replace("%", "_") for name in FIELD_ATTR}


@dataclasses.dataclass
class FieldErrors:
    name: str
    ndim: int
    minval: float
    maxval: float
    maxerr: float
    errsum: float
    refsum: float
    avgpgp: float

    @property
    def relerr(self) -> float:
        """Relative error variant selection (ref: validate_mod.F90:273-283)."""
        eps = np.finfo(np.float64).eps
        if self.errsum < eps:
            return 0.0
        if self.refsum < eps:
            return self.errsum / (1.0 + self.refsum)
        return self.errsum / self.refsum

    @property
    def flagged(self) -> bool:
        return self.relerr > 10.0 * np.finfo(np.float64).eps


def field_errors(name: str, field, ref, ngptotg: int | None = None) -> FieldErrors:
    """Error statistics for one field (ref: validate_mod.F90 VALIDATE_R1/R2/R3).

    Large fields take the threaded C++ single-pass path (the analogue of the
    reference's native cloudsc_validate.c); numpy otherwise.
    """
    field = np.asarray(field, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    n = ngptotg if ngptotg is not None else field.shape[-1]
    stats = None
    if field.size > (1 << 20) and field.shape == ref.shape:
        from .native import field_stats_native

        stats = field_stats_native(field, ref)
    if stats is None:
        diff = np.abs(field - ref)
        stats = (
            float(field.min()), float(field.max()), float(diff.max()),
            float(diff.sum()), float(np.abs(ref).sum()),
        )
    minval, maxval, maxerr, errsum, refsum = stats
    return FieldErrors(
        name=name,
        ndim=field.ndim,
        minval=float(minval),
        maxval=float(maxval),
        maxerr=float(maxerr),
        errsum=float(errsum),
        refsum=float(refsum),
        avgpgp=float(errsum / n),
    )


def _e20_13(x: float) -> str:
    """Fortran E20.13 formatting: 0.XXXXXXXXXXXXXE+ee in a 20-char field."""
    if x == 0.0:
        return "0.0000000000000E+00".rjust(20)
    import math

    neg = x < 0.0
    ax = abs(x)
    exp = int(math.floor(math.log10(ax))) + 1
    mant = ax / 10.0**exp
    # rounding may push the mantissa to 1.0
    mant_str = f"{mant:.13f}"
    if mant_str.startswith("1"):
        exp += 1
        mant = ax / 10.0**exp
        mant_str = f"{mant:.13f}"
    body = f"0.{mant_str[2:]}E{exp:+03d}"
    if neg:
        body = "-" + body
    return body.rjust(20)


def error_line(errs: FieldErrors) -> str:
    """One validation row (ref: validate_mod.F90:292-294 format 1000)."""
    relerr = errs.relerr
    iopt = 1 if errs.errsum < np.finfo(np.float64).eps else (
        2 if errs.refsum < np.finfo(np.float64).eps else 3
    )
    clwarn = " !!!!" if errs.flagged else ""
    vals = "".join(
        " " + _e20_13(v)
        for v in (errs.minval, errs.maxval, errs.maxerr, errs.avgpgp, 100.0 * relerr)
    )
    return f" {errs.name:<20s} {errs.ndim}D{iopt}{vals}{clwarn}"


def validation_header() -> str:
    names = ["MinValue", "MaxValue", "AbsMaxErr", "AvgAbsErr/GP", "MaxRelErr-%"]
    return " " + f"{'Variable':<20s} {'Dim':<3s}" + "".join(f" {n:<20s}" for n in names)


def validate_outputs(outputs, reference: dict, ngptotg: int | None = None,
                     print_table: bool = True) -> list[FieldErrors]:
    """Validate a CloudscOutputs struct against the reference dict."""
    results = []
    lines = [validation_header()] if print_table else []
    for name, _ in VALIDATION_ORDER:
        got = np.asarray(getattr(outputs, FIELD_ATTR[name]))
        want = np.asarray(reference[REF_DATASET[name]])
        errs = field_errors(name, got, want, ngptotg=ngptotg)
        results.append(errs)
        if print_table:
            lines.append(error_line(errs))
    if print_table:
        print("\n".join(lines))
    return results
