"""Energy monitor (the EC_PMON analogue, ref: ec_pmon_mod.F90:14-57)."""

import pytest

from cloudsc_tpu.runtime import pmon


def test_disabled_without_env(monkeypatch):
    monkeypatch.delenv("EC_PMON", raising=False)
    assert pmon.energy_power() is None
    s = pmon.EnergySampler()
    s.start()
    assert s.stop_and_report() is None


def test_enabled_reads_or_none(monkeypatch):
    monkeypatch.setenv("EC_PMON", "1")
    # on hosts without Cray counters/RAPL this is None; where counters exist
    # it must return (energy_J, power_W) floats
    r = pmon.energy_power()
    if r is not None:
        e, p = r
        assert e >= 0.0 and p >= 0.0


def test_driver_backend_validation():
    from cloudsc_tpu.runtime.driver import CloudscDriver

    with pytest.raises(ValueError, match="unknown backend"):
        CloudscDriver.__new__(CloudscDriver)._resolve_backend("cuda")
