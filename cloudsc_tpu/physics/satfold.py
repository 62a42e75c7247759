"""Load-time folding of the saturation curves and the 3.4b Newton adjustment.

Motivation (docs/PERFORMANCE.md "The overlap verdict"): the fused kernel is
COMPUTE-bound — its HBM stream hides completely under the VPU time — so
per-level quantities that are pure functions of the INPUTS can be computed
once at load time (fp64, file width, microseconds) and STREAMED instead of
recomputed per step, trading nearly-free bytes for scarce VPU cycles:

  curve_rows   the section-1 saturation block (scheme.level_init:263-286,
               ref: cloudsc.F90:749-784): two exponentials + eight divides
               per level become nine streamed rows (CLOUDSC_FOLD_CURVES)
  newton_zdqs  the 3.4b forcing chain + inlined 2-iteration CUADJTQ
               (scheme.level_step:524-552, ref: cloudsc.F90:1281-1325):
               four exponentials + ~10 divides become ONE streamed row
               (CLOUDSC_FOLD_NEWTON) — the whole block exists solely to
               produce ZDQS

Everything here is numpy (the host pack path must not touch the
accelerator) and mirrors the scheme formulas term for term; the sync is
pinned by tests/test_satfold.py against the fp64 jnp scheme. Like the
round-4 input fold, the fp64-at-load values are a strictly more accurate
single rounding than the working-precision arithmetic they replace —
folded vs unfolded runs differ pointwise within the fp32 noise floor
(tests/test_satfold.py bounds it against the fp64 truth).
"""

from __future__ import annotations

import numpy as np

CURVE_ROWS = ("zqsmix", "zqsliq", "zqsice", "zfoeew", "zfoeewmt",
              "zfoeeliqt", "zfokoop", "zfoeeliq", "zfoeeice")


def curve_rows(c, ztp1, pap) -> dict:
    """The nine saturation-curve rows (fp64), formula-for-formula with
    scheme.level_init's saturation block (scheme.py:263-286)."""
    thf, cst = c.thf, c.cst
    RETV = c.RETV
    x = (np.maximum(thf.rtice, np.minimum(thf.rtwat, ztp1)) - thf.rtice) \
        * thf.rtwat_rtice_r
    zfoealfa = np.minimum(1.0, x * x)
    exp_liq = np.exp(thf.r3les * (ztp1 - cst.rtt) / (ztp1 - thf.r4les))
    exp_ice = np.exp(thf.r3ies * (ztp1 - cst.rtt) / (ztp1 - thf.r4ies))
    zfoeeliq = thf.r2es * exp_liq
    zfoeeice = thf.r2es * exp_ice
    zfoeewmt = np.minimum(
        thf.r2es * (zfoealfa * exp_liq + (1.0 - zfoealfa) * exp_ice) / pap,
        0.5,
    )
    zqsmix = zfoeewmt / (1.0 - RETV * zfoeewmt)
    zdelta = np.where(ztp1 >= cst.rtt, 1.0, 0.0)
    zfoeew = np.minimum((zdelta * zfoeeliq + (1.0 - zdelta) * zfoeeice) / pap,
                        0.5)
    zfoeew = np.minimum(0.5, zfoeew)
    zqsice = zfoeew / (1.0 - RETV * zfoeew)
    zfoeeliqt = np.minimum(zfoeeliq / pap, 0.5)
    zqsliq = zfoeeliqt / (1.0 - RETV * zfoeeliqt)
    zfokoop = np.minimum(thf.rkoop1 - thf.rkoop2 * ztp1,
                         zfoeeliq / zfoeeice)
    return dict(
        zqsmix=zqsmix, zqsliq=zqsliq, zqsice=zqsice, zfoeew=zfoeew,
        zfoeewmt=zfoeewmt, zfoeeliqt=zfoeeliqt, zfokoop=zfokoop,
        zfoeeliq=zfoeeliq, zfoeeice=zfoeeice,
    )


def _foealfa(t, thf):
    x = (np.maximum(thf.rtice, np.minimum(thf.rtwat, t)) - thf.rtice) \
        * thf.rtwat_rtice_r
    return np.minimum(1.0, x * x)


def newton_zdqs(c, ztp1, pap, paph, pmf, zhr, pvervel, zqsmix):
    """The ZDQS row (fp64): 3.4b forcing + inlined CUADJTQ, term-for-term
    with scheme.level_step:524-552. `paph` has nlev+1 rows; everything else
    (nlev, nc). The last level's pmf_next read is masked to zero exactly as
    the kernel's not_last guard does."""
    thf, cst = c.thf, c.cst
    RETV, RG = c.RETV, c.RG
    ptsphy, zqtmst, zrdcp = c.ptsphy, c.zqtmst, c.zrdcp

    zdp = paph[1:] - paph[:-1]
    zdtdp = zrdcp * ztp1 / pap
    zdpmxdt = zdp * zqtmst
    zmfdn2 = np.concatenate([pmf[1:], np.zeros_like(pmf[:1])], axis=0)
    zwtot = pvervel + 0.5 * RG * (pmf + zmfdn2)
    zwtot = np.minimum(zdpmxdt, np.maximum(-zdpmxdt, zwtot))
    zdtdiab = np.minimum(zdpmxdt * zdtdp,
                         np.maximum(-zdpmxdt * zdtdp, zhr)) * ptsphy
    zdtforc = zdtdp * zwtot * ptsphy + zdtdiab
    tloc = np.maximum(ztp1 + zdtforc, 160.0)
    qloc = zqsmix
    zqp = 1.0 / pap
    for _ in range(2):  # inlined CUADJTQ, 2 Newton iterations (ref: 1303-1319)
        alfa_n = _foealfa(tloc, thf)
        foeewm = thf.r2es * (
            alfa_n * np.exp(thf.r3les * (tloc - cst.rtt) / (tloc - thf.r4les))
            + (1.0 - alfa_n)
            * np.exp(thf.r3ies * (tloc - cst.rtt) / (tloc - thf.r4ies))
        )
        zqsat = np.minimum(foeewm * zqp, 0.5)
        zcor_n = 1.0 / (1.0 - RETV * zqsat)
        zqsat = zqsat * zcor_n
        foedem = alfa_n * thf.r5alvcp * (1.0 / (tloc - thf.r4les) ** 2) + (
            1.0 - alfa_n
        ) * thf.r5alscp * (1.0 / (tloc - thf.r4ies) ** 2)
        zcond = (qloc - zqsat) / (1.0 + zqsat * zcor_n * foedem)
        tloc = tloc + (alfa_n * thf.ralvdcp
                       + (1.0 - alfa_n) * thf.ralsdcp) * zcond
        qloc = qloc - zcond
    return qloc - zqsmix
