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
  dep_rows     the 3.7 ice-deposition chain up to its raw deposition
               amount (ref: cloudsc.F90:1519-1689, BOTH IDEPICE options):
               the ice-nucleation exponential, the two **0.666 powers,
               the sqrt and ~10 divides are pure functions of the level
               inputs (the in-cloud ice they seed is the SECTION-3.0
               value, before any carry touches zqxfg) — two streamed rows
               (zdep0, zinfac; CLOUDSC_FOLD_DEP); only the cloud-top
               reduction (a carry) and the first-guess clamp stay in
               kernel

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
DEP_ROWS = ("zdep0", "zinfac")
_ZEPSEC = 1.0e-14  # scheme.ZEPSEC (ref: cloudsc.F90:589)
_IL, _II, _IR, _IS, _IV = 0, 1, 2, 3, 4


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


def _state_clip(c, zqv, za, zqx_cld):
    """Section 1's tiny-value tidy (scheme.level_init:241-261,289; ref:
    cloudsc.F90:696-743,786): returns (za, zqx[5]) post-clip — the values
    section 3.0 derives its in-cloud condensate from. The tendency/zlneg
    bookkeeping is NOT reproduced (dep_rows does not need it)."""
    e = c.e
    zqx = [None] * 5
    zqx[_IV] = zqv
    for m in (_IL, _II, _IR, _IS):
        zqx[m] = zqx_cld[m]
    cond = ((zqx[_IL] + zqx[_II]) < e.rlmin) | (za < e.ramin)
    for m in (_IL, _II):
        zqx[_IV] = zqx[_IV] + np.where(cond, zqx[m], 0.0)
        zqx[m] = np.where(cond, 0.0, zqx[m])
    za = np.where(cond, 0.0, za)
    for m in (_IL, _II, _IR, _IS):
        c2 = zqx[m] < e.rlmin
        zqx[_IV] = zqx[_IV] + np.where(c2, zqx[m], 0.0)
        zqx[m] = np.where(c2, 0.0, zqx[m])
    za = np.maximum(0.0, np.minimum(1.0, za))
    return za, zqx


def dep_rows(c, ztp1, zqv, za_in, zqx_cld, pap, curves) -> dict:
    """The two folded ice-deposition rows (fp64), formula-for-formula with
    scheme.level_step's 3.7 block (scheme.py:777-822, ref:
    cloudsc.F90:1519-1689) up to the raw per-level deposition amount:

      zdep0   max(za*(zinew - zice0), 0)   [IDEPICE=1, Rotstayn 2001]
              max(za*zterm1*zterm2*dt, 0)  [IDEPICE=2, ice PSD]
      zinfac  min(zicenuclei/15000, 1)     (feeds the cloud-top reduction)

    Everything here depends only on the level inputs: the in-cloud ice is
    the SECTION-3.0 value (zqx[II] post-clip / max(za, ZEPSEC)), computed
    before any carry touches zqxfg. The carry-dependent remainder — the
    ztopred cloud-top factor and min(zdep0, zqxfg[IL]) — stays in-kernel.
    `curves` supplies zfoeeice/zfokoop (curve_rows of the same inputs)."""
    e = c.e
    RV, RD, RLSTT = c.RV, c.RD, c.RLSTT
    ptsphy = c.ptsphy
    za, zqx = _state_clip(c, zqv, za_in, zqx_cld)
    ztmpa = 1.0 / np.maximum(za, _ZEPSEC)
    zicecld = zqx[_II] * ztmpa
    zrho = pap / (RD * ztp1)
    zvpice = curves["zfoeeice"] * RV / RD
    zvpliq = zvpice * curves["zfokoop"]
    zicenuclei = 1000.0 * np.exp(
        12.96 * (zvpliq - zvpice) / zvpliq - 0.639
    )
    zinfac = np.minimum(zicenuclei / 15000.0, 1.0)
    zice0 = np.maximum(zicecld, zicenuclei * e.riceinit / zrho)
    if c.IDEPICE == 1:  # Rotstayn 2001 monodisperse (ref: 1519-1601)
        zadd = RLSTT * (RLSTT / (RV * ztp1) - 1.0) / (2.4e-2 * ztp1)
        zbdd = RV * ztp1 * pap / (2.21 * zvpice)
        zcvds = (
            7.8
            * (zicenuclei / zrho) ** 0.666
            * (zvpliq - zvpice)
            / (8.87 * (zadd + zbdd) * zvpice)
        )
        zinew_b = 0.666 * zcvds * ptsphy + zice0 ** 0.666
        zinew = zinew_b * np.sqrt(zinew_b)          # == zinew_b**1.5
        zdep0 = np.maximum(za * (zinew - zice0), 0.0)
    else:  # IDEPICE == 2: ice-PSD deposition (ref: 1608-1689)
        zaplusb = (
            e.rcl_apb1 * zvpice - e.rcl_apb2 * zvpice * ztp1
            + pap * e.rcl_apb3 * (ztp1 * ztp1 * ztp1)
        )
        zcorrfac = np.sqrt(1.0 / zrho)
        ztq = ztp1 / 273.0
        zcorrfac2 = ztq * np.sqrt(ztq) * (393.0 / (ztp1 + 120.0))
        zpr02 = zrho * zice0 * e.rcl_const1i  # ZTCG = ZFACX1I = 1
        zterm1 = (
            (zvpliq - zvpice) * ztp1 ** 2 * zvpice * zcorrfac2
            * e.rcl_const2i / (zrho * zaplusb * zvpice)
        )
        zterm2 = (
            0.65 * e.rcl_const6i * zpr02 ** e.rcl_const4i
            + e.rcl_const3i * np.sqrt(zcorrfac) * np.sqrt(zrho)
            * zpr02 ** e.rcl_const5i / np.sqrt(zcorrfac2)
        )
        zdep0 = np.maximum(za * zterm1 * zterm2 * ptsphy, 0.0)
    return dict(zdep0=zdep0, zinfac=zinfac)


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
