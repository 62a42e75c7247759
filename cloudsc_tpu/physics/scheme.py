"""Shape-agnostic CLOUDSC physics: per-level state init + the level step.

These functions contain the entire scheme body (behavioral spec:
src/cloudsc_fortran/cloudsc.F90 in the reference; all ref: line numbers below
point there). They are written purely elementwise over arrays of *any* shape so
the same code drives two execution engines:

  - the XLA path (`physics.cloudsc`): `level_init` batched over (nlev, ncol),
    then `lax.scan` calling `level_step` on (ncol,) rows;
  - the Pallas TPU kernel (`kernels.pallas_cloudsc`): both called per level on
    (sublanes, 128) VMEM tiles inside a sequential grid — the k-caching
    schedule (ref: src/cloudsc_cuda/cloudsc/cloudsc_c_k_caching.cu:55-77).

Floating-point op order follows the Fortran statement order so fp64 results
match reference.h5 to ~1e-13 relative; fp32 uses the same code path (the
reference's SINGLE build split, ref: parkind1.F90:40-44, is a dtype parameter).
"""

from __future__ import annotations

from types import SimpleNamespace

import jax.numpy as jnp

from .thermo import (
    foealfa,
    foedelta,
    foeeice,
    foeeliq,
    foeewm,
    foedem,
    foeldcpm,
    fokoop,
)

# 0-based species indices (ref: yoecldp.F90:86-91)
IL, II, IR, IS, IV = 0, 1, 2, 3, 4
NCLV = 5
# phase markers: 0=vapour 1=liquid 2=ice (ref: cloudsc.F90:603-607)
IPHASE = (1, 2, 1, 2, 0)
# melting targets (ref: cloudsc.F90:613-617)
IMELT = (II, IR, IS, IR, -1)
# falling species (rain, snow; ice sediments but LLFALL=false, ref: 640-651)
LLFALL = (False, False, True, True, False)

ZEPSEC = 1.0e-14  # ref: cloudsc.F90:589
# numerical wet-bulb fit constants (ref: cloudsc.F90:421-425)
ZTW1, ZTW2, ZTW3, ZTW4, ZTW5 = 1329.31, 0.0074615, 0.85e5, 40.637, 275.0

CARRY_KEYS = (
    "zanewm1", "zqxnm1", "pfplsx", "zcovptot", "zcovpmax",
    "zcldtopdist", "llrainliq", "prainfrac",
)


def chain(terms):
    """Left-to-right sum, preserving the Fortran accumulation order."""
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def derived_consts(params, ptsphy: float, dtype) -> SimpleNamespace:
    """Scalar constants shared by every section (the ASSOCIATE block +
    derived values, ref: cloudsc.F90:503-545, 585-591). Everything is a plain
    Python float/int/bool — an XLA compile-time constant (the TPU analogue of
    the reference's CUDA constant memory, ref: yomcst.cuf.F90)."""
    cst, thf, e = params.ydcst, params.ydthf, params.ydecldp
    c = SimpleNamespace()
    c.cst, c.thf, c.e = cst, thf, e
    c.ptsphy = float(ptsphy)
    c.RG, c.RD, c.RCPD, c.RETV = cst.rg, cst.rd, cst.rcpd, cst.retv
    c.RLVTT, c.RLSTT, c.RLMLT = cst.rlvtt, cst.rlstt, cst.rlmlt
    c.RTT, c.RV = cst.rtt, cst.rv
    c.R4LES, c.R4IES = thf.r4les, thf.r4ies
    c.R5LES, c.R5IES = thf.r5les, thf.r5ies
    c.RALVDCP, c.RALSDCP, c.RALFDCP = thf.ralvdcp, thf.ralsdcp, thf.ralfdcp
    c.NCLDTOP = int(e.ncldtop)      # 1-based as in Fortran
    c.NSSOPT = int(e.nssopt)
    c.LAERICESED = bool(e.laericesed)
    c.LAERICEAUTO = bool(e.laericeauto)
    c.LAERLIQAUTOLSP = bool(e.laerliqautolsp)
    c.LAERLIQCOLL = bool(e.laerliqcoll)
    # scheme-version switches (ref: cloudsc.F90:562-580); only the default
    # configuration (2/2/1/1) is wired — the alternates raise for now.
    c.IWARMRAIN, c.IEVAPRAIN, c.IEVAPSNOW, c.IDEPICE = 2, 2, 1, 1
    c.zqtmst = 1.0 / c.ptsphy
    c.zrdcp = c.RD / c.RCPD
    c.zrg_r = 1.0 / c.RG
    c.zrldcp = 1.0 / (c.RALSDCP - c.RALVDCP)
    # 100*eps of the working precision (ref: 555)
    c.zepsilon = 100.0 * float(jnp.finfo(dtype).eps)
    c.zvqx = (0.0, e.rvice, e.rvrain, e.rvsnow, 0.0)  # fall speed per species
    c.dtype = dtype
    return c


def level_init(raw: dict, c) -> dict:
    """Section 1 'initial values' (ref: 654-808), elementwise over any shape.

    `raw` holds same-shape arrays: pt, pq, pa, pap, tendency_tmp_{t,q,a},
    pclv (list of NCLV... only the 4 condensates used), tendency_tmp_cld
    (list of 4). Returns every derived per-level quantity the level step
    consumes, plus the section-1 tendency/clipping bookkeeping (zlneg, zqx0).
    """
    cst, thf, e = c.cst, c.thf, c.e
    zqtmst, RETV = c.zqtmst, c.RETV
    RALVDCP, RALSDCP = c.RALVDCP, c.RALSDCP

    ztp1 = raw["pt"] + c.ptsphy * raw["tendency_tmp_t"]
    zqx = [None] * NCLV
    zqx[IV] = raw["pq"] + c.ptsphy * raw["tendency_tmp_q"]
    for m in (IL, II, IR, IS):
        zqx[m] = raw["pclv"][m] + c.ptsphy * raw["tendency_tmp_cld"][m]
    zqx0 = list(zqx)
    za = raw["pa"] + c.ptsphy * raw["tendency_tmp_a"]
    zaorig = za

    zero = jnp.zeros_like(ztp1)
    tend_t = zero
    tend_q = zero
    zlneg = [zero] * NCLV

    # tidy tiny cloud cover / total water (ref: 696-721)
    cond = ((zqx[IL] + zqx[II]) < e.rlmin) | (za < e.ramin)
    for m, lat in ((IL, RALVDCP), (II, RALSDCP)):
        zlneg[m] = zlneg[m] + jnp.where(cond, zqx[m], 0.0)
        zqadj = zqx[m] * zqtmst
        tend_q = tend_q + jnp.where(cond, zqadj, 0.0)
        tend_t = tend_t - jnp.where(cond, lat * zqadj, 0.0)
        zqx[IV] = zqx[IV] + jnp.where(cond, zqx[m], 0.0)
        zqx[m] = jnp.where(cond, 0.0, zqx[m])
    za = jnp.where(cond, 0.0, za)

    # tidy small CLV amounts (ref: 727-743)
    for m in (IL, II, IR, IS):
        c2 = zqx[m] < e.rlmin
        zlneg[m] = zlneg[m] + jnp.where(c2, zqx[m], 0.0)
        zqadj = zqx[m] * zqtmst
        tend_q = tend_q + jnp.where(c2, zqadj, 0.0)
        lat = RALVDCP if IPHASE[m] == 1 else RALSDCP
        tend_t = tend_t - jnp.where(c2, lat * zqadj, 0.0)
        zqx[IV] = zqx[IV] + jnp.where(c2, zqx[m], 0.0)
        zqx[m] = jnp.where(c2, 0.0, zqx[m])

    # saturation curves (ref: 749-784)
    pap = raw["pap"]
    zfoealfa = foealfa(ztp1, thf)
    zfoeewmt = jnp.minimum(foeewm(ztp1, cst, thf) / pap, 0.5)
    zqsmix = zfoeewmt / (1.0 - RETV * zfoeewmt)
    zdelta = foedelta(ztp1, cst)
    zfoeew = jnp.minimum(
        (zdelta * foeeliq(ztp1, cst, thf) + (1.0 - zdelta) * foeeice(ztp1, cst, thf))
        / pap,
        0.5,
    )
    zfoeew = jnp.minimum(0.5, zfoeew)
    zqsice = zfoeew / (1.0 - RETV * zfoeew)
    zfoeeliqt = jnp.minimum(foeeliq(ztp1, cst, thf) / pap, 0.5)
    zqsliq = zfoeeliqt / (1.0 - RETV * zfoeeliqt)

    # cloud fraction in [0,1]; liquid/ice split (ref: 786-808)
    za = jnp.maximum(0.0, jnp.minimum(1.0, za))
    zli = zqx[IL] + zqx[II]
    has_li = zli > e.rlmin
    zliqfrac = jnp.where(has_li, zqx[IL] / jnp.where(has_li, zli, 1.0), 0.0)
    zicefrac = jnp.where(has_li, 1.0 - zliqfrac, 0.0)

    return dict(
        ztp1=ztp1, za=za, zaorig=zaorig, zqx=zqx, zqx0=zqx0,
        zqsmix=zqsmix, zqsliq=zqsliq, zqsice=zqsice,
        zfoeew=zfoeew, zfoeewmt=zfoeewmt, zfoeeliqt=zfoeeliqt,
        zfoealfa=zfoealfa, zli=zli, zliqfrac=zliqfrac, zicefrac=zicefrac,
        tend_t_pre=tend_t, tend_q_pre=tend_q, zlneg=zlneg,
    )


def initial_carry(like, c) -> dict:
    """Column-carry reset (ref: 687, 838-843); `like` sets shape/dtype."""
    zero = jnp.zeros_like(like)
    return dict(
        zanewm1=zero,
        zqxnm1=[zero] * NCLV,
        pfplsx=[zero] * NCLV,     # flux arriving at the current level
        zcovptot=zero,
        zcovpmax=zero,
        zcldtopdist=zero,
        llrainliq=jnp.ones_like(like, dtype=bool),
        prainfrac=zero,
    )


def level_step(x: dict, carry: dict, c) -> tuple[dict, dict]:
    """Sections 3-6 for one level (ref: 854-2775), elementwise over any shape.

    `x` holds per-level slabs (see cloudsc.py's make_x / the Pallas kernel for
    the exact contract); `carry` holds the JK->JK+1 recurrences. Returns
    (new_carry, ys) where ys are the per-level emissions.
    """
    e, cst, thf = c.e, c.cst, c.thf
    ptsphy, zqtmst = c.ptsphy, c.zqtmst
    RG, RD, RETV, RTT, RV = c.RG, c.RD, c.RETV, c.RTT, c.RV
    RLSTT = c.RLSTT
    R4LES, R4IES, R5LES, R5IES = c.R4LES, c.R4IES, c.R5LES, c.R5IES
    RALVDCP, RALSDCP = c.RALVDCP, c.RALSDCP
    zrldcp, zrdcp, zrg_r, zepsilon = c.zrldcp, c.zrdcp, c.zrg_r, c.zepsilon
    NSSOPT = c.NSSOPT

    not_first = x["not_first"]
    not_last = x["not_last"]
    ztp1 = x["ztp1"]
    za = x["za"]
    zqx = list(x["zqx"])
    zqsmix, zqsliq, zqsice = x["zqsmix"], x["zqsliq"], x["zqsice"]
    pap, paph, paph_next = x["pap"], x["paph"], x["paph_next"]
    paph_surf = x["paph_surf"]
    land, ldcum, ktype = x["land"], x["ldcum"], x["ktype"]
    zfoealfa_k = x["zfoealfa"]
    pfplsx_row = carry["pfplsx"]

    zero = jnp.zeros_like(ztp1)
    dtype = ztp1.dtype

    def madd(mask, v):
        return jnp.where(mask, v, 0.0)

    # ---- 3.0 per-level init (ref: 854-983) --------------------------
    zqxfg = list(zqx)
    solqa = [[zero for _ in range(NCLV)] for _ in range(NCLV)]
    solqb = [[zero for _ in range(NCLV)] for _ in range(NCLV)]
    zfallsrce = [zero] * NCLV
    zfallsink = [zero] * NCLV
    zconvsrce = [zero] * NCLV
    zconvsink = [zero] * NCLV
    zpsupsatsrce = [zero] * NCLV
    solab = zero
    solac = zero

    zdp = paph_next - paph
    zgdp = RG / zdp
    zrho = pap / (RD * ztp1)
    zdtgdp = ptsphy * zgdp
    zrdtgdp = zdp * (1.0 / (ptsphy * RG))

    zfacw = R5LES / (ztp1 - R4LES) ** 2
    zcor = 1.0 / (1.0 - RETV * x["zfoeeliqt"])
    zdqsliqdt = zfacw * zcor * zqsliq
    zcorqsliq = 1.0 + RALVDCP * zdqsliqdt

    zfaci = R5IES / (ztp1 - R4IES) ** 2
    zcor = 1.0 / (1.0 - RETV * x["zfoeew"])
    zdqsicedt = zfaci * zcor * zqsice
    zcorqsice = 1.0 + RALSDCP * zdqsicedt

    zalfaw = zfoealfa_k
    zfac = zalfaw * zfacw + (1.0 - zalfaw) * zfaci
    zcor = 1.0 / (1.0 - RETV * x["zfoeewmt"])
    zdqsmixdt = zfac * zcor * zqsmix
    zcorqsmix = 1.0 + foeldcpm(ztp1, thf) * zdqsmixdt

    zevaplimmix = jnp.maximum((zqsmix - zqx[IV]) / zcorqsmix, 0.0)
    zevaplimice = jnp.maximum((zqsice - zqx[IV]) / zcorqsice, 0.0)
    del zevaplimice  # computed for parity; unused in this configuration

    ztmpa = 1.0 / jnp.maximum(za, ZEPSEC)
    zliqcld = zqx[IL] * ztmpa
    zicecld = zqx[II] * ztmpa
    zlicld = zliqcld + zicecld

    # evaporate very small liquid/ice (ref: 971-983)
    for m in (IL, II):
        tiny = zqx[m] < e.rlmin
        solqa[IV][m] = madd(tiny, zqx[m])
        solqa[m][IV] = -madd(tiny, zqx[m])

    # ---- 3.1 ice supersaturation adjustment (ref: 985-1088) ---------
    zfokoop = fokoop(ztp1, cst, thf)
    warm_or_off = (ztp1 >= RTT) | (NSSOPT == 0)
    zfac = jnp.where(warm_or_off, 1.0, za + zfokoop * (1.0 - za))
    zfaci = jnp.where(warm_or_off, 1.0, ptsphy / e.rkooptau)

    high_a = za > 1.0 - e.ramin
    zsup_cld = jnp.maximum((zqx[IV] - zfac * zqsice) / zcorqsice, 0.0)
    zqp1env = (zqx[IV] - za * zqsice) / jnp.maximum(1.0 - za, zepsilon)
    zsup_env = jnp.maximum(
        (1.0 - za) * (zqp1env - zfac * zqsice) / zcorqsice, 0.0
    )
    zsupsat = jnp.where(high_a, zsup_cld, zsup_env)

    has_sup = zsupsat > ZEPSEC
    warm = ztp1 > e.rthomo
    for m, w in ((IL, warm), (II, ~warm)):
        amt = madd(has_sup & w, zsupsat)
        solqa[m][IV] = solqa[m][IV] + amt
        solqa[IV][m] = solqa[IV][m] - amt
        zqxfg[m] = zqxfg[m] + amt
    solac = jnp.where(has_sup, (1.0 - za) * zfaci, solac)

    psupsat = x["psupsat"]
    has_ps = psupsat > ZEPSEC
    for m, w in ((IL, warm), (II, ~warm)):
        amt = madd(has_ps & w, psupsat)
        solqa[m][m] = solqa[m][m] + amt
        zpsupsatsrce[m] = amt
        zqxfg[m] = zqxfg[m] + amt
    solac = jnp.where(has_ps, (1.0 - za) * zfaci, solac)

    # ---- 3.2 detrainment from convection (ref: 1100-1127) -----------
    zdtgdp_ = zdtgdp
    plude_scaled = x["plude_in"] * zdtgdp_
    plu_next = x["plu_next"]
    lcond = (
        not_last & ldcum & (plude_scaled > e.rlmin) & (plu_next > ZEPSEC)
    )
    solac = solac + madd(lcond, plude_scaled / jnp.where(lcond, plu_next, 1.0))
    zconvsrce[IL] = madd(lcond, zalfaw * plude_scaled)
    zconvsrce[II] = madd(lcond, (1.0 - zalfaw) * plude_scaled)
    solqa[IL][IL] = solqa[IL][IL] + zconvsrce[IL]
    solqa[II][II] = solqa[II][II] + zconvsrce[II]
    plude_out = jnp.where(
        not_last, jnp.where(lcond, plude_scaled, 0.0), x["plude_in"]
    )
    solqa[IS][IS] = solqa[IS][IS] + madd(
        not_last & ldcum, x["psnde"] * zdtgdp
    )

    # ---- 3.3 subsidence source + in-layer evaporation (ref: 1143-1194)
    zmf = jnp.maximum(0.0, (x["pmfu"] + x["pmfd"]) * zdtgdp)
    zacust = zmf * carry["zanewm1"]
    zlcust = [zero] * NCLV
    for m in (IL, II):
        zlcust[m] = madd(not_first, zmf * carry["zqxnm1"][m])
        zconvsrce[m] = zconvsrce[m] + zlcust[m]
    zdtdp = zrdcp * 0.5 * (x["ztp1_prev"] + ztp1) / paph
    zdtforc = zdtdp * (pap - x["pap_prev"])
    zdqs_sub = carry["zanewm1"] * zdtforc * zdqsmixdt
    zlfinalsum = zero
    for m in (IL, II):
        zlfinal = jnp.maximum(0.0, zlcust[m] - zdqs_sub)
        zevap = jnp.minimum(zlcust[m] - zlfinal, zevaplimmix)
        zlfinal = zlcust[m] - zevap
        zlfinalsum = zlfinalsum + madd(not_first, zlfinal)
        solqa[m][m] = solqa[m][m] + madd(not_first, zlcust[m])
        solqa[IV][m] = solqa[IV][m] + madd(not_first, zevap)
        solqa[m][IV] = solqa[m][IV] - madd(not_first, zevap)
    zacust = jnp.where(zlfinalsum < ZEPSEC, 0.0, zacust)
    solac = solac + madd(not_first, zacust)

    # subsidence sink to layer below (ref: 1201-1217)
    zmfdn = madd(
        not_last,
        jnp.maximum(0.0, (x["pmfu_next"] + x["pmfd_next"]) * zdtgdp),
    )
    solab = solab + zmfdn
    solqb[IL][IL] = solqb[IL][IL] + zmfdn
    solqb[II][II] = solqb[II][II] + zmfdn
    zconvsink[IL] = zmfdn
    zconvsink[II] = zmfdn

    # ---- 3.4 turbulent erosion (ref: 1230-1261) ----------------------
    zldifdt = jnp.where(
        (ktype > 0) & (plude_out > ZEPSEC),
        e.rcldiff_convi * e.rcldiff * ptsphy,
        e.rcldiff * ptsphy,
    )
    has_cld = x["zli"] > ZEPSEC
    ze = zldifdt * jnp.maximum(zqsmix - zqx[IV], 0.0)
    zleros = za * ze
    zleros = jnp.minimum(zleros, zevaplimmix)
    zleros = jnp.minimum(zleros, x["zli"])
    zaeros = zleros / jnp.where(has_cld, zlicld, 1.0)
    solac = solac - madd(has_cld, zaeros)
    for m, frac in ((IL, x["zliqfrac"]), (II, x["zicefrac"])):
        amt = madd(has_cld, frac * zleros)
        solqa[IV][m] = solqa[IV][m] + amt
        solqa[m][IV] = solqa[m][IV] - amt

    # ---- 3.4b condensation/evaporation from dqsat/dt (ref: 1281-1325)
    zdtdp = zrdcp * ztp1 / pap
    zdpmxdt = zdp * zqtmst
    zmfdn2 = madd(not_last, x["pmfu_next"] + x["pmfd_next"])
    zwtot = x["pvervel"] + 0.5 * RG * (x["pmfu"] + x["pmfd"] + zmfdn2)
    zwtot = jnp.minimum(zdpmxdt, jnp.maximum(-zdpmxdt, zwtot))
    zzzdt = x["phrsw"] + x["phrlw"]
    zdtdiab = (
        jnp.minimum(zdpmxdt * zdtdp, jnp.maximum(-zdpmxdt * zdtdp, zzzdt))
        * ptsphy
    )  # + RALFDCP*ZLDEFR, with ZLDEFR==0 (ref: 1290-1293)
    zdtforc = zdtdp * zwtot * ptsphy + zdtdiab
    tloc = jnp.maximum(ztp1 + zdtforc, 160.0)
    qloc = zqsmix
    zqp = 1.0 / pap
    for _ in range(2):  # inlined CUADJTQ, 2 Newton iterations (ref: 1303-1319)
        zqsat = jnp.minimum(foeewm(tloc, cst, thf) * zqp, 0.5)
        zcor_n = 1.0 / (1.0 - RETV * zqsat)
        zqsat = zqsat * zcor_n
        zcond = (qloc - zqsat) / (1.0 + zqsat * zcor_n * foedem(tloc, thf))
        tloc = tloc + foeldcpm(tloc, thf) * zcond
        qloc = qloc - zcond
    zdqs = qloc - zqsmix

    # 3.4a evaporation of clouds (ref: 1333-1356)
    evap_m = zdqs > 0.0
    zlevap = za * jnp.minimum(zdqs, zlicld)
    zlevap = jnp.minimum(zlevap, zevaplimmix)
    zlevap = jnp.minimum(zlevap, jnp.maximum(zqsmix - zqx[IV], 0.0))
    for m, frac in ((IL, x["zliqfrac"]), (II, x["zicefrac"])):
        amt = madd(evap_m, frac * zlevap)
        solqa[IV][m] = solqa[IV][m] + amt
        solqa[m][IV] = solqa[m][IV] - amt

    # 3.4b(1) increase of cloud water in existing clouds (ref: 1362-1396)
    c1m = (za > ZEPSEC) & (zdqs <= -e.rlmin)
    zlcond1 = jnp.maximum(-zdqs, 0.0)
    zcorq = 1.0 / (1.0 - RETV * zqsmix)
    zcdmax = jnp.where(
        za > 0.99,
        (zqx[IV] - zqsmix) / (1.0 + zcorq * zqsmix * foedem(ztp1, thf)),
        (zqx[IV] - za * zqsmix) / jnp.where(c1m, za, 1.0),
    )
    zlcond1 = jnp.maximum(jnp.minimum(zlcond1, zcdmax), 0.0)
    zlcond1 = za * zlcond1
    zlcond1 = jnp.where(zlcond1 < e.rlmin, 0.0, zlcond1)
    for m, w in ((IL, warm), (II, ~warm)):
        amt = madd(c1m & w, zlcond1)
        solqa[m][IV] = solqa[m][IV] + amt
        solqa[IV][m] = solqa[IV][m] - amt
        zqxfg[m] = zqxfg[m] + amt

    # 3.4b(2) generation of new clouds (ref: 1400-1499)
    c2m = (zdqs <= -e.rlmin) & (za < 1.0 - ZEPSEC)
    zsigk = pap / paph_surf
    zrhc = jnp.where(
        zsigk > 0.8,
        e.ramid + (1.0 - e.ramid) * ((zsigk - 0.8) / 0.2) ** 2,
        e.ramid,
    )
    if NSSOPT in (0, 1):  # none / Tompkins
        zqe = (zqx[IV] - za * zqsice) / jnp.maximum(ZEPSEC, 1.0 - za)
        zqe = jnp.maximum(0.0, zqe)
    elif NSSOPT == 2:  # Lohmann and Karcher
        zqe = zqx[IV]
    else:  # Gierens
        zqe = zqx[IV] + x["zli"]
    zfac2 = jnp.where((ztp1 >= RTT) | (NSSOPT == 0), 1.0, zfokoop)
    in_range = (zqe >= zrhc * zqsice * zfac2) & (zqe < zqsice * zfac2)
    c2m = c2m & in_range
    zacond = (
        -(1.0 - za) * zfac2 * zdqs
        / jnp.maximum(2.0 * (zfac2 * zqsice - zqe), ZEPSEC)
    )
    zacond = jnp.minimum(zacond, 1.0 - za)
    zlcond2 = -zfac2 * zdqs * 0.5 * zacond
    zzdl = 2.0 * (zfac2 * zqsice - zqe) / jnp.maximum(ZEPSEC, 1.0 - za)
    zlcondlim = (za - 1.0) * zfac2 * zdqs - zfac2 * zqsice + zqx[IV]
    zlcond2 = jnp.where(
        zfac2 * zdqs < -zzdl, jnp.minimum(zlcond2, zlcondlim), zlcond2
    )
    zlcond2 = jnp.maximum(zlcond2, 0.0)
    kill = (zlcond2 < e.rlmin) | ((1.0 - za) < ZEPSEC)
    zlcond2 = jnp.where(kill, 0.0, zlcond2)
    zacond = jnp.where(kill | (zlcond2 == 0.0), 0.0, zacond)
    solac = solac + madd(c2m, zacond)
    for m, w in ((IL, warm), (II, ~warm)):
        amt = madd(c2m & w, zlcond2)
        solqa[m][IV] = solqa[m][IV] + amt
        solqa[IV][m] = solqa[IV][m] - amt
        zqxfg[m] = zqxfg[m] + amt

    # ---- 3.7 ice deposition, Rotstayn 2001 (ref: 1519-1601) ----------
    reset_top = (x["za_prev"] < e.rcldtopcf) & (za >= e.rcldtopcf)
    zcldtopdist = jnp.where(
        reset_top, 0.0, carry["zcldtopdist"] + zdp / (zrho * RG)
    )
    dep_m = (ztp1 < RTT) & (zqxfg[IL] > e.rlmin)
    zvpice = foeeice(ztp1, cst, thf) * RV / RD
    zvpliq = zvpice * zfokoop
    zicenuclei = 1000.0 * jnp.exp(
        12.96 * (zvpliq - zvpice) / zvpliq - 0.639
    )
    zadd = RLSTT * (RLSTT / (RV * ztp1) - 1.0) / (2.4e-2 * ztp1)
    zbdd = RV * ztp1 * pap / (2.21 * zvpice)
    zcvds = (
        7.8
        * (zicenuclei / zrho) ** 0.666
        * (zvpliq - zvpice)
        / (8.87 * (zadd + zbdd) * zvpice)
    )
    zice0 = jnp.maximum(zicecld, zicenuclei * e.riceinit / zrho)
    zinew = (0.666 * zcvds * ptsphy + zice0**0.666) ** 1.5
    zdepos = jnp.maximum(za * (zinew - zice0), 0.0)
    zdepos = jnp.minimum(zdepos, zqxfg[IL])
    zinfactor = jnp.minimum(zicenuclei / 15000.0, 1.0)
    zdepos = zdepos * jnp.minimum(
        zinfactor
        + (1.0 - zinfactor)
        * (e.rdepliqrefrate + zcldtopdist / e.rdepliqrefdepth),
        1.0,
    )
    amt = madd(dep_m, zdepos)
    solqa[II][IL] = solqa[II][IL] + amt
    solqa[IL][II] = solqa[IL][II] - amt
    zqxfg[II] = zqxfg[II] + amt
    zqxfg[IL] = zqxfg[IL] - amt

    # ==============================================================
    # 4. PRECIPITATION PROCESSES
    # ==============================================================
    # revised in-cloud condensate (ref: 1700-1705)
    ztmpa = 1.0 / jnp.maximum(za, ZEPSEC)
    zliqcld = zqxfg[IL] * ztmpa
    zicecld = zqxfg[II] * ztmpa
    zlicld = zliqcld + zicecld

    # 4.2 sedimentation source/sink (ref: 1714-1749)
    zqpretot = zero
    for m in (II, IR, IS):
        zfallsrce[m] = madd(not_first, pfplsx_row[m] * zdtgdp)
        solqa[m][m] = solqa[m][m] + zfallsrce[m]
        zqxfg[m] = zqxfg[m] + zfallsrce[m]
        zqpretot = zqpretot + madd(not_first, zqxfg[m])
        if m == II and c.LAERICESED:
            vq = 0.002 * x["pre_ice"]
        else:
            vq = c.zvqx[m]
        zfallsink[m] = zdtgdp * (vq * zrho)

    # 4.3p precip cover overlap, MAX-RAN (ref: 1767-1784)
    has_pre = zqpretot > ZEPSEC
    zcovptot = carry["zcovptot"]
    zcovptot_new = 1.0 - (
        (1.0 - zcovptot)
        * (1.0 - jnp.maximum(za, x["za_prev"]))
        / (1.0 - jnp.minimum(x["za_prev"], 1.0 - 1.0e-6))
    )
    zcovptot = jnp.where(has_pre, jnp.maximum(zcovptot_new, e.rcovpmin), 0.0)
    zcovpclr = jnp.where(has_pre, jnp.maximum(0.0, zcovptot - za), 0.0)
    covp_safe = jnp.where(has_pre, zcovptot, 1.0)
    zraincld = jnp.where(has_pre, zqxfg[IR] / covp_safe, 0.0)
    zsnowcld = jnp.where(has_pre, zqxfg[IS] / covp_safe, 0.0)
    zcovpmax = jnp.where(
        has_pre, jnp.maximum(zcovptot, carry["zcovpmax"]), 0.0
    )

    # 4.3a snow autoconversion, Lin et al. 1983 (ref: 1789-1811)
    snow_m = (ztp1 <= RTT) & (zicecld > ZEPSEC)
    zzco = ptsphy * e.rsnowlin1 * jnp.exp(e.rsnowlin2 * (ztp1 - RTT))
    if c.LAERICEAUTO:
        zlcrit = x["picrit_aer"]
        zzco = zzco * (e.rnice / x["pnice"]) ** 0.333
    else:
        zlcrit = e.rlcritsnow
    zsnowaut = zzco * (1.0 - jnp.exp(-((zicecld / zlcrit) ** 2)))
    solqb[IS][II] = solqb[IS][II] + madd(snow_m, zsnowaut)

    # 4.3b warm-rain autoconversion/accretion (ref: 1819-1927)
    liq_m = zliqcld > ZEPSEC
    if c.IWARMRAIN == 2:  # Khairoutdinov and Kogan (2000)
        zconst = jnp.where(
            land, e.rcl_kk_cloud_num_land, e.rcl_kk_cloud_num_sea
        )
        zlcrit = jnp.where(land, e.rclcrit_land, e.rclcrit_sea)
        above = zliqcld > zlcrit
        zrainaut = (
            1.5 * za * ptsphy
            * e.rcl_kkaau
            * jnp.maximum(zliqcld, 0.0) ** e.rcl_kkbauq
            * zconst ** e.rcl_kkbaun
        )
        zrainaut = jnp.minimum(zrainaut, zqxfg[IL])
        zrainaut = jnp.where(zrainaut < ZEPSEC, 0.0, zrainaut)
        zrainacc = (
            2.0 * za * ptsphy
            * e.rcl_kkaac
            * jnp.maximum(zliqcld * zraincld, 0.0) ** e.rcl_kkbac
        )
        zrainacc = jnp.minimum(zrainacc, zqxfg[IL])
        zrainacc = jnp.where(zrainacc < ZEPSEC, 0.0, zrainacc)
        zrainaut = jnp.where(above, zrainaut, 0.0)
        zrainacc = jnp.where(above, zrainacc, 0.0)
        cold = ztp1 <= RTT
        for dst, sel in ((IS, cold), (IR, ~cold)):
            mm = liq_m & sel
            solqa[dst][IL] = solqa[dst][IL] + madd(mm, zrainaut)
            solqa[dst][IL] = solqa[dst][IL] + madd(mm, zrainacc)
            solqa[IL][dst] = solqa[IL][dst] - madd(mm, zrainaut)
            solqa[IL][dst] = solqa[IL][dst] - madd(mm, zrainacc)
    else:
        raise NotImplementedError("IWARMRAIN=1 (Sundqvist) not wired")

    # riming: snow collects cloud liquid (ref: 1935-1980)
    rime_m = (ztp1 <= RTT) & (zliqcld > ZEPSEC)
    zfallcorr = (e.rdensref / zrho) ** 0.4
    rime2 = rime_m & (zsnowcld > ZEPSEC) & (zcovptot > 0.01)
    rime_base = jnp.maximum(zrho * zsnowcld * e.rcl_const1s, 0.0)
    zsnowrime = (
        0.3 * zcovptot * ptsphy * e.rcl_const7s * zfallcorr
        * rime_base ** e.rcl_const8s
    )
    zsnowrime = jnp.minimum(zsnowrime, 1.0)
    solqb[IS][IL] = solqb[IS][IL] + madd(rime2, zsnowrime)

    # 4.4a melting of snow and ice (ref: 1990-2034)
    zicetot = zqxfg[II] + zqxfg[IS]
    melt_m = (zicetot > ZEPSEC) & (ztp1 > RTT)
    zsubsat = jnp.maximum(zqsice - zqx[IV], 0.0)
    ztdmtw0 = ztp1 - RTT - zsubsat * (
        ZTW1 + ZTW2 * (pap - ZTW3) - ZTW4 * (ztp1 - ZTW5)
    )
    zcons1 = jnp.abs(ptsphy * (1.0 + 0.5 * ztdmtw0) / e.rtaumel)
    zmeltmax = madd(melt_m, jnp.maximum(ztdmtw0 * zcons1 * zrldcp, 0.0))
    for m in (II, IS):
        n = IMELT[m]
        mm = (zmeltmax > ZEPSEC) & (zicetot > ZEPSEC)
        zalfa_m = zqxfg[m] / jnp.where(mm, zicetot, 1.0)
        zmelt = jnp.minimum(zqxfg[m], zalfa_m * zmeltmax)
        amt = madd(mm, zmelt)
        zqxfg[m] = zqxfg[m] - amt
        zqxfg[n] = zqxfg[n] + amt
        solqa[n][m] = solqa[n][m] + amt
        solqa[m][n] = solqa[m][n] - amt

    # 4.4b freezing of rain (ref: 2039-2094)
    rain_p = zqx[IR] > ZEPSEC
    latch = rain_p & (ztp1 <= RTT) & (x["ztp1_prev"] > RTT)
    zqpretot_f = jnp.maximum(zqx[IS] + zqx[IR], ZEPSEC)
    prainfrac = jnp.where(latch, zqx[IR] / zqpretot_f, carry["prainfrac"])
    # pure logical form (a bool-valued select does not lower on Mosaic)
    llrainliq = (latch & (prainfrac > 0.8)) | (~latch & carry["llrainliq"])
    frz_cold = rain_p & (ztp1 < RTT)
    lam_den = jnp.where(rain_p, zrho * zqx[IR], 1.0)
    zlambda = (e.rcl_fac1 / lam_den) ** e.rcl_fac2
    ztemp = e.rcl_fzrab * (ztp1 - RTT)
    zfrz_het = (
        ptsphy * (e.rcl_const5r / zrho)
        * (jnp.exp(ztemp) - 1.0)
        * zlambda ** e.rcl_const6r
    )
    zfrzmax_liq = jnp.maximum(zfrz_het, 0.0)
    zcons1f = jnp.abs(ptsphy * (1.0 + 0.5 * (RTT - ztp1)) / e.rtaumel)
    zfrzmax_mix = jnp.maximum((RTT - ztp1) * zcons1f * zrldcp, 0.0)
    zfrzmax = jnp.where(llrainliq, zfrzmax_liq, zfrzmax_mix)
    frz_m = frz_cold & (zfrzmax > ZEPSEC)
    zfrz = jnp.minimum(zqx[IR], zfrzmax)
    amt = madd(frz_m, zfrz)
    solqa[IS][IR] = solqa[IS][IR] + amt
    solqa[IR][IS] = solqa[IR][IS] - amt

    # 4.4c freezing of liquid (ref: 2099-2112)
    zfrzmax = jnp.maximum((e.rthomo - ztp1) * zrldcp, 0.0)
    frz_m = (zfrzmax > ZEPSEC) & (zqxfg[IL] > ZEPSEC)
    zfrz = jnp.minimum(zqxfg[IL], zfrzmax)
    amt = madd(frz_m, zfrz)
    solqa[II][IL] = solqa[II][IL] + amt
    solqa[IL][II] = solqa[IL][II] - amt

    # 4.5 rain evaporation, Abel and Boutle 2013 (ref: 2192-2279)
    if c.IEVAPRAIN == 2:
        zzrh = e.rprecrhmax + (1.0 - e.rprecrhmax) * zcovpmax / jnp.maximum(
            ZEPSEC, 1.0 - za
        )
        zzrh = jnp.minimum(jnp.maximum(zzrh, e.rprecrhmax), 1.0)
        zzrh = jnp.minimum(0.8, zzrh)
        zqe = jnp.maximum(0.0, jnp.minimum(zqx[IV], zqsliq))
        llo1 = (
            (zcovpclr > ZEPSEC)
            & (zqxfg[IR] > ZEPSEC)
            & (zqe < zzrh * zqsliq)
        )
        zpreclr = zqxfg[IR] / jnp.where(llo1, zcovptot, 1.0)
        zesatliq = RV / RD * foeeliq(ztp1, cst, thf)
        lam_den = jnp.where(llo1, zrho * zpreclr, 1.0)
        zlambda = (e.rcl_fac1 / lam_den) ** e.rcl_fac2
        # T**3._JPRB in the Fortran is a *real* power (libm pow), not x*x*x
        zevap_denom = (
            e.rcl_cdenom1 * zesatliq
            - e.rcl_cdenom2 * ztp1 * zesatliq
            + e.rcl_cdenom3 * jnp.power(ztp1, 3.0) * pap
        )
        zcorr2 = (ztp1 / 273.0) ** 1.5 * 393.0 / (ztp1 + 120.0)
        zsubsat = jnp.maximum(zzrh * zqsliq - zqe, 0.0)
        zbeta = (
            (0.5 / zqsliq) * ztp1**2 * zesatliq
            * e.rcl_const1r
            * (zcorr2 / zevap_denom)
            * (
                0.78 / zlambda ** e.rcl_const4r
                + e.rcl_const2r
                * (zrho * zfallcorr) ** 0.5
                / (zcorr2**0.5 * zlambda ** e.rcl_const3r)
            )
        )
        zdenom = 1.0 + zbeta * ptsphy
        zdpevap = zcovpclr * zbeta * ptsphy * zsubsat / zdenom
        zevap = jnp.minimum(zdpevap, zqxfg[IR])
        amt = madd(llo1, zevap)
        solqa[IV][IR] = solqa[IV][IR] + amt
        solqa[IR][IV] = solqa[IR][IV] - amt
        zcovptot = jnp.where(
            llo1,
            jnp.maximum(
                e.rcovpmin,
                zcovptot
                - jnp.maximum(
                    0.0,
                    (zcovptot - za) * zevap / jnp.where(llo1, zqxfg[IR], 1.0),
                ),
            ),
            zcovptot,
        )
        zqxfg[IR] = zqxfg[IR] - amt
    else:
        raise NotImplementedError("IEVAPRAIN=1 (Sundqvist) not wired")

    # 4.5 snow sublimation, Sundqvist (ref: 2289-2347)
    if c.IEVAPSNOW == 1:
        zzrh = e.rprecrhmax + (1.0 - e.rprecrhmax) * zcovpmax / jnp.maximum(
            ZEPSEC, 1.0 - za
        )
        zzrh = jnp.minimum(jnp.maximum(zzrh, e.rprecrhmax), 1.0)
        zqe = (zqx[IV] - za * zqsice) / jnp.maximum(ZEPSEC, 1.0 - za)
        zqe = jnp.maximum(0.0, jnp.minimum(zqe, zqsice))
        llo1 = (
            (zcovpclr > ZEPSEC)
            & (zqxfg[IS] > ZEPSEC)
            & (zqe < zzrh * zqsice)
        )
        denom = zcovptot * zdtgdp
        denom = jnp.sign(denom) * jnp.maximum(jnp.abs(denom), zepsilon)
        denom = jnp.where(denom == 0.0, zepsilon, denom)
        zpreclr = zqxfg[IS] * zcovpclr / denom
        zbeta1 = (
            jnp.sqrt(pap / paph_surf)
            / e.rvrfactor
            * zpreclr
            / jnp.maximum(zcovpclr, ZEPSEC)
        )
        zbeta = RG * e.rpecons * jnp.maximum(zbeta1, 0.0) ** 0.5777
        zdenom = 1.0 + zbeta * ptsphy * zcorqsice
        zdpr = zcovpclr * zbeta * (zqsice - zqe) / zdenom * zdp * zrg_r
        zdpevap = zdpr * zdtgdp
        zevap = jnp.minimum(zdpevap, zqxfg[IS])
        amt = madd(llo1, zevap)
        solqa[IV][IS] = solqa[IV][IS] + amt
        solqa[IS][IV] = solqa[IS][IV] - amt
        zcovptot = jnp.where(
            llo1,
            jnp.maximum(
                e.rcovpmin,
                zcovptot
                - jnp.maximum(
                    0.0,
                    (zcovptot - za) * zevap / jnp.where(llo1, zqxfg[IS], 1.0),
                ),
            ),
            zcovptot,
        )
        zqxfg[IS] = zqxfg[IS] - amt
    else:
        raise NotImplementedError("IEVAPSNOW=2 not wired")

    # 4.6 evaporate small precipitation amounts (ref: 2426-2435)
    for m in (IR, IS):
        small = zqxfg[m] < e.rlmin
        solqa[IV][m] = solqa[IV][m] + madd(small, zqxfg[m])
        solqa[m][IV] = solqa[m][IV] - madd(small, zqxfg[m])

    # ==============================================================
    # 5.1 cloud-fraction solver (ref: 2446-2455)
    # ==============================================================
    zanew = jnp.minimum((za + solac) / (1.0 + solab), 1.0)
    zanew = jnp.where(zanew < e.ramin, 0.0, zanew)
    zda = zanew - x["zaorig"]
    zanewm1_new = zanew

    # ==============================================================
    # 5.2.1 conservation scaling of explicit sinks (ref: 2467-2580)
    # ==============================================================
    # The Fortran sorts the 5 species by run-out ratio (ascending strict-<
    # scan; first minimum wins, ref: 2502-2527) then rescales the negative
    # entries of the selected row and column (ref: 2533-2580). Here this is
    # a branch-free 5-round selection with one-hot masks — fully elementwise
    # so it runs identically on (ncol,) rows and (sublane, lane) VMEM tiles.
    zsinksum = [
        chain([-solqa[m][n] for n in range(NCLV)]) for m in range(NCLV)
    ]
    zmax = [jnp.maximum(zqx[m], ZEPSEC) for m in range(NCLV)]
    zratio = [zmax[m] / jnp.maximum(zsinksum[m], zmax[m]) for m in range(NCLV)]
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    avail = [jnp.ones_like(ztp1, dtype=bool) for _ in range(NCLV)]
    for _ in range(NCLV):
        masked = [jnp.where(avail[m], zratio[m], big) for m in range(NCLV)]
        vmin = masked[0]
        for m in range(1, NCLV):
            vmin = jnp.minimum(vmin, masked[m])
        sel = [None] * NCLV
        found = jnp.zeros_like(ztp1, dtype=bool)
        for m in range(NCLV):
            win = (masked[m] == vmin) & ~found
            sel[m] = win
            found = found | win
        for m in range(NCLV):
            avail[m] = avail[m] & ~sel[m]
        # row r = selected species: row[n] = solqa[r][n]
        row = [
            chain([madd(sel[m], solqa[m][n]) for m in range(NCLV)])
            for n in range(NCLV)
        ]
        neg = [row[n] < 0.0 for n in range(NCLV)]
        sink = chain([-row[n] for n in range(NCLV)])
        zmm = jnp.maximum(
            chain([madd(sel[m], zqx[m]) for m in range(NCLV)]), ZEPSEC
        )
        ratio_r = zmm / jnp.maximum(sink, zmm)
        for n in range(NCLV):
            new_rn = jnp.where(neg[n], row[n] * ratio_r, row[n])
            for m in range(NCLV):
                solqa[m][n] = jnp.where(sel[m], new_rn, solqa[m][n])
        # column r: col[m] = solqa[m][r] (post row update); rescale entries
        # flagged negative by the *row* test, exactly as the XLA-path einsum
        # formulation validated against the reference at 1e-13
        col = [
            chain([madd(sel[n], solqa[m][n]) for n in range(NCLV)])
            for m in range(NCLV)
        ]
        for m in range(NCLV):
            new_cm = jnp.where(neg[m], col[m] * ratio_r, col[m])
            for n in range(NCLV):
                solqa[m][n] = jnp.where(sel[n], new_cm, solqa[m][n])

    # ==============================================================
    # 5.2.2 implicit 5x5 solve (LHS build + non-pivoting LU,
    #       ref: 2589-2668) — fully unrolled over species
    # ==============================================================
    one = jnp.ones_like(ztp1)
    qlhs = [[None] * NCLV for _ in range(NCLV)]
    for mcol in range(NCLV):
        for nrow in range(NCLV):
            if nrow == mcol:
                diag = one + zfallsink[mcol]
                for o in range(NCLV):
                    diag = diag + solqb[o][nrow]
                qlhs[nrow][mcol] = diag
            else:
                qlhs[nrow][mcol] = -solqb[nrow][mcol]
    zqxn = [
        zqx[m] + chain([solqa[m][n] for n in range(NCLV)])
        for m in range(NCLV)
    ]
    # non-pivoting recursive factorization (ref: 2640-2650)
    for jn in range(NCLV - 1):
        for jm in range(jn + 1, NCLV):
            qlhs[jm][jn] = qlhs[jm][jn] / qlhs[jn][jn]
            for ik in range(jn + 1, NCLV):
                qlhs[jm][ik] = qlhs[jm][ik] - qlhs[jm][jn] * qlhs[jn][ik]
    # backsubstitution (ref: 2654-2668)
    for jn in range(1, NCLV):
        for jm in range(jn):
            zqxn[jn] = zqxn[jn] - qlhs[jn][jm] * zqxn[jm]
    zqxn[NCLV - 1] = zqxn[NCLV - 1] / qlhs[NCLV - 1][NCLV - 1]
    for jn in range(NCLV - 2, -1, -1):
        for jm in range(jn + 1, NCLV):
            zqxn[jn] = zqxn[jn] - qlhs[jn][jm] * zqxn[jm]
        zqxn[jn] = zqxn[jn] / qlhs[jn][jn]

    # clip small/negative values to vapour (ref: 2673-2680)
    for n in (IL, II, IR, IS):
        neg_n = zqxn[n] < ZEPSEC
        zqxn[IV] = zqxn[IV] + madd(neg_n, zqxn[n])
        zqxn[n] = jnp.where(neg_n, 0.0, zqxn[n])

    # ==============================================================
    # 5.3 precipitation flux to the next level (ref: 2698-2712)
    # ==============================================================
    pfplsx_next = [zfallsink[m] * zqxn[m] * zrdtgdp for m in range(NCLV)]
    zqpre2 = pfplsx_next[IS] + pfplsx_next[IR]
    zcovptot = jnp.where(zqpre2 < ZEPSEC, 0.0, zcovptot)

    # ==============================================================
    # 6. tendencies (ref: 2722-2773)
    # ==============================================================
    tend_t = x["tend_t_pre"]
    for m in (IL, II, IR, IS):
        zfluxq = (
            zpsupsatsrce[m]
            + zconvsrce[m]
            + zfallsrce[m]
            - (zfallsink[m] + zconvsink[m]) * zqxn[m]
        )
        lat = RALVDCP if IPHASE[m] == 1 else RALSDCP
        tend_t = tend_t + lat * (zqxn[m] - zqx[m] - zfluxq) * zqtmst
    tend_q = x["tend_q_pre"] + (zqxn[IV] - zqx[IV]) * zqtmst
    tend_a = zda * zqtmst

    new_carry = dict(
        zanewm1=zanewm1_new,
        zqxnm1=list(zqxn),
        pfplsx=pfplsx_next,
        zcovptot=zcovptot,
        zcovpmax=zcovpmax,
        zcldtopdist=zcldtopdist,
        llrainliq=llrainliq,
        prainfrac=prainfrac,
    )
    ys = dict(
        zqxn=list(zqxn),
        pfplsx_next=pfplsx_next,
        plude=plude_out,
        pcovptot=zcovptot,
        tend_t=tend_t,
        tend_q=tend_q,
        tend_a=tend_a,
    )
    return new_carry, ys
