"""Saturation/thermodynamic functions as jnp expressions.

These are the cy39 ECMWF physics thermodynamical functions
(ref: src/common/include/fcttre.func.h, fccld.func.h), re-expressed as ordinary
vectorized JAX functions. Parameters arrive as Python scalars (compile-time
constants under jit), temperatures as arrays of the working dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def foedelta(t, cst):
    """1 for water (T>=RTT), 0 for ice (ref: fcttre.func.h:41)."""
    return jnp.where(t >= cst.rtt, 1.0, 0.0)


def foealfa(t, thf):
    """Mixed-phase liquid fraction in [0,1] (ref: fcttre.func.h:83-84)."""
    x = (jnp.maximum(thf.rtice, jnp.minimum(thf.rtwat, t)) - thf.rtice) * thf.rtwat_rtice_r
    return jnp.minimum(1.0, x * x)


def foeeliq(t, cst, thf):
    """Saturation vapour pressure wrt liquid (ref: fcttre.func.h:163)."""
    return thf.r2es * jnp.exp(thf.r3les * (t - cst.rtt) / (t - thf.r4les))


def foeeice(t, cst, thf):
    """Saturation vapour pressure wrt ice (ref: fcttre.func.h:164)."""
    return thf.r2es * jnp.exp(thf.r3ies * (t - cst.rtt) / (t - thf.r4ies))


def foeewm(t, cst, thf):
    """Mixed-phase saturation vapour pressure (ref: fcttre.func.h:90-92)."""
    alfa = foealfa(t, thf)
    return thf.r2es * (
        alfa * jnp.exp(thf.r3les * (t - cst.rtt) / (t - thf.r4les))
        + (1.0 - alfa) * jnp.exp(thf.r3ies * (t - cst.rtt) / (t - thf.r4ies))
    )


def foedem(t, thf):
    """d(qsat)/dT factor, mixed phase (ref: fcttre.func.h:100-101)."""
    alfa = foealfa(t, thf)
    return alfa * thf.r5alvcp * (1.0 / (t - thf.r4les) ** 2) + (
        1.0 - alfa
    ) * thf.r5alscp * (1.0 / (t - thf.r4ies) ** 2)


def foeldcpm(t, thf):
    """L/cp, mixed phase (ref: fcttre.func.h:103-104)."""
    alfa = foealfa(t, thf)
    return alfa * thf.ralvdcp + (1.0 - alfa) * thf.ralsdcp


def fokoop(t, cst, thf):
    """Koop homogeneous ice-nucleation supersaturation limit (ref: fccld.func.h:27)."""
    return jnp.minimum(
        thf.rkoop1 - thf.rkoop2 * t, foeeliq(t, cst, thf) / foeeice(t, cst, thf)
    )


# -- variants with a precomputed mixed-phase fraction -------------------------
# Bitwise-identical formulas to the functions above, with foealfa(t) hoisted so
# one evaluation feeds foeewm/foedem/foeldcpm in the saturation-adjustment
# Newton iterations (the kernel's hot transcendental path).

def foeewm_a(t, alfa, cst, thf):
    return thf.r2es * (
        alfa * jnp.exp(thf.r3les * (t - cst.rtt) / (t - thf.r4les))
        + (1.0 - alfa) * jnp.exp(thf.r3ies * (t - cst.rtt) / (t - thf.r4ies))
    )


def foedem_a(t, alfa, thf):
    return alfa * thf.r5alvcp * (1.0 / (t - thf.r4les) ** 2) + (
        1.0 - alfa
    ) * thf.r5alscp * (1.0 / (t - thf.r4ies) ** 2)


def foeldcpm_a(alfa, thf):
    return alfa * thf.ralvdcp + (1.0 - alfa) * thf.ralsdcp
