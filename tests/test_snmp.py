"""Verbatim-fixture tests for the SNMP table→variable mapping
(sources/snmp.py vs tools/snmp_hoststats.py semantics).

The walk fixture is hand-written (hostname, ts, oid, value, vtype)
bindings; expected points are hand-computed from the reference's
CollectInterfaceStats / CollectFilesystemStats / CollectSystemStats
logic, exercising: the HC 64-bit override (present for one interface,
absent for the other), SnmpTable title-row naming with numeric-index
fallback, SetVarType datatype labels incl. TimeTicks units, MAC
formatting (and its six-octet gate), the hrStorageType OID gates,
block-size multiplication, uptime tick truncation, and the drop rules
for unknown types / non-numeric values / short OIDs / missing ifIndex.
"""

from __future__ import annotations

import pytest

from open_instrument_spark.sources.snmp import (
    parse_snmp_filesystem_stats,
    parse_snmp_hoststats,
    parse_snmp_interface_stats,
    parse_snmp_system_stats,
)

TS = "2024-01-15 12:00:00"
IFE = "iso.org.dod.internet.mgmt.mib-2.interfaces.ifTable.ifEntry"
IFX = "iso.org.dod.internet.mgmt.mib-2.ifMIB.ifMIBObjects.ifXTable.ifXEntry"
HRS = "iso.org.dod.internet.mgmt.mib-2.host.hrStorage.hrStorageTable.hrStorageEntry"
SYS = "iso.org.dod.internet.mgmt.mib-2.host.hrSystem"


def _walk(spark, rows):
    return spark.createDataFrame(
        [(h, TS, o, v, t) for (h, o, v, t) in rows],
        "hostname string, ts string, oid string, value string, vtype string",
    ).selectExpr(
        "hostname", "CAST(ts AS TIMESTAMP) ts", "oid", "value", "vtype"
    )


IF_ROWS = [
    # interface 1 "eth0": HC override present for ifInOctets
    ("sw1", f"{IFE}.ifIndex.1", "1", "Integer"),
    ("sw1", f"{IFE}.ifDescr.1", "eth0", "OctetString"),
    ("sw1", f"{IFE}.ifInOctets.1", "1000", "Counter32"),
    ("sw1", f"{IFE}.ifSpeed.1", "100000000", "Gauge32"),
    ("sw1", f"{IFE}.ifAdminStatus.1", "1", "Integer"),
    ("sw1", f"{IFE}.ifPhysAddress.1", "ABC123", "OctetString"),
    ("sw1", f"{IFX}.ifName.1", "eth0", "OctetString"),
    ("sw1", f"{IFX}.ifHCInOctets.1", "5000000000", "Counter64"),
    # interface 2 "ppp7": no HC row → Counter32 fallback; TimeTicks stat
    ("sw1", f"{IFE}.ifIndex.2", "2", "Integer"),
    ("sw1", f"{IFE}.ifDescr.2", "ppp7", "OctetString"),
    ("sw1", f"{IFE}.ifInOctets.2", "42", "Counter32"),
    ("sw1", f"{IFE}.ifOutQLen.2", "77", "TimeTicks"),
    # unknown SNMP type → dropped (SetVarType falls through)
    ("sw1", f"{IFE}.ifMtu.2", "1500", "Opaque"),
    # non-numeric Counter → reference float() crash → dropped here
    ("sw1", f"{IFE}.ifInErrors.2", "oops", "Counter32"),
    # bad MAC (5 octets) → dropped
    ("sw1", f"{IFE}.ifPhysAddress.2", "ABCDE", "OctetString"),
    # interface 3: no ifIndex → whole interface skipped
    ("sw1", f"{IFE}.ifDescr.3", "ghost", "OctetString"),
    ("sw1", f"{IFE}.ifInOctets.3", "9", "Counter32"),
    # short oid → dropped by the len(oid)<2 rule
    ("sw1", "x", "1", "Integer"),
]


def test_interface_stats(spark):
    pts = parse_snmp_interface_stats(
        _walk(spark, IF_ROWS), srchost="mon1"
    ).collect()
    by = {(r["name"], r["labels"]["interface"]): r for r in pts}

    # HC override: eth0 ifInOctets takes the Counter64 value and type
    r = by[("/network/interface/stats/ifInOctets", "eth0")]
    assert r["dval"] == 5000000000.0 and r["labels"]["datatype"] == "counter"
    # fallback: ppp7 keeps the 32-bit counter
    r = by[("/network/interface/stats/ifInOctets", "ppp7")]
    assert r["dval"] == 42.0 and r["labels"]["datatype"] == "counter"
    # gauge + integer datatypes
    assert by[("/network/interface/stats/ifSpeed", "eth0")]["labels"]["datatype"] == "gauge"
    assert by[("/network/interface/stats/ifAdminStatus", "eth0")]["dval"] == 1.0
    # TimeTicks → integer + units=ticks
    r = by[("/network/interface/stats/ifOutQLen", "ppp7")]
    assert r["labels"]["datatype"] == "integer" and r["labels"]["units"] == "ticks"
    # ifDescr emits as a STRING point
    r = by[("/network/interface/stats/ifDescr", "eth0")]
    assert r["sval"] == "eth0" and r["dval"] is None
    # MAC formatting: 'ABC123' → 41:42:43:31:32:33
    r = by[("/network/interface/stats/ifPhysAddress", "eth0")]
    assert r["sval"] == "41:42:43:31:32:33"
    # labels carry hostname + srchost everywhere
    assert r["labels"]["hostname"] == "sw1" and r["labels"]["srchost"] == "mon1"

    names = set(by)
    # drops: unknown type, non-numeric counter, 5-octet MAC, ghost if
    assert ("/network/interface/stats/ifMtu", "ppp7") not in names
    assert ("/network/interface/stats/ifInErrors", "ppp7") not in names
    assert ("/network/interface/stats/ifPhysAddress", "ppp7") not in names
    assert not any(i == "ghost" for (_, i) in names)
    # exactly the surviving points, nothing extra
    assert len(pts) == 8


HR_ROWS = [
    # fixed disk "/" (type .4): filesystem trio
    ("h1", f"{HRS}.hrStorageType.1", "1.3.6.1.2.1.25.2.1.4", "OctetString"),
    ("h1", f"{HRS}.hrStorageDescr.1", "/", "OctetString"),
    ("h1", f"{HRS}.hrStorageAllocationUnits.1", "4096", "Integer"),
    ("h1", f"{HRS}.hrStorageSize.1", "1000", "Integer"),
    ("h1", f"{HRS}.hrStorageUsed.1", "250", "Integer"),
    # ram (type .2): /system/ram trio with space label
    ("h1", f"{HRS}.hrStorageType.2", "1.3.6.1.2.1.25.2.1.2", "OctetString"),
    ("h1", f"{HRS}.hrStorageDescr.2", "Physical memory", "OctetString"),
    ("h1", f"{HRS}.hrStorageAllocationUnits.2", "1024", "Integer"),
    ("h1", f"{HRS}.hrStorageSize.2", "16384", "Integer"),
    ("h1", f"{HRS}.hrStorageUsed.2", "8192", "Integer"),
    # virtual memory (type .3) also feeds /system/ram
    ("h1", f"{HRS}.hrStorageType.3", "1.3.6.1.2.1.25.2.1.3", "OctetString"),
    ("h1", f"{HRS}.hrStorageDescr.3", "Virtual memory", "OctetString"),
    ("h1", f"{HRS}.hrStorageAllocationUnits.3", "1024", "Integer"),
    ("h1", f"{HRS}.hrStorageSize.3", "100", "Integer"),
    ("h1", f"{HRS}.hrStorageUsed.3", "40", "Integer"),
    # removable disk (type .5): matches no gate → no points
    ("h1", f"{HRS}.hrStorageType.4", "1.3.6.1.2.1.25.2.1.5", "OctetString"),
    ("h1", f"{HRS}.hrStorageDescr.4", "/mnt/usb", "OctetString"),
    ("h1", f"{HRS}.hrStorageAllocationUnits.4", "512", "Integer"),
    ("h1", f"{HRS}.hrStorageSize.4", "10", "Integer"),
    ("h1", f"{HRS}.hrStorageUsed.4", "1", "Integer"),
    # fixed disk with non-numeric size → int() crash → dropped
    ("h1", f"{HRS}.hrStorageType.5", "1.3.6.1.2.1.25.2.1.4", "OctetString"),
    ("h1", f"{HRS}.hrStorageDescr.5", "/bad", "OctetString"),
    ("h1", f"{HRS}.hrStorageAllocationUnits.5", "512", "Integer"),
    ("h1", f"{HRS}.hrStorageSize.5", "huge", "Integer"),
    ("h1", f"{HRS}.hrStorageUsed.5", "1", "Integer"),
]


def test_filesystem_stats(spark):
    pts = parse_snmp_filesystem_stats(_walk(spark, HR_ROWS), srchost="mon1").collect()
    by = {r["name"]: r for r in pts}
    assert len(pts) == 3  # only the one healthy fixed disk
    assert by["/system/filesystem/size"]["dval"] == 1000 * 4096.0
    assert by["/system/filesystem/used"]["dval"] == 250 * 4096.0
    assert by["/system/filesystem/available"]["dval"] == 750 * 4096.0
    lbl = by["/system/filesystem/size"]["labels"]
    assert lbl["device"] == "/" and "datatype" not in lbl


SYS_ROWS = [
    ("h1", f"{SYS}.hrSystemUptime.0", "123456", "TimeTicks"),
    ("h1", f"{SYS}.hrSystemInitialLoadParameters.0",
     "BOOT_IMAGE=/vmlinuz ro quiet", "OctetString"),
    ("h1", f"{SYS}.hrSystemNumUsers.0", "3", "Gauge32"),
    ("h1", f"{SYS}.hrSystemProcesses.0", "211", "Gauge32"),
    # extra hrSystem scalar the reference ignores
    ("h1", f"{SYS}.hrSystemDate.0", "2024-1-15", "OctetString"),
]


def test_system_stats(spark):
    pts = parse_snmp_system_stats(
        _walk(spark, SYS_ROWS + HR_ROWS), srchost="mon1"
    ).collect()
    by = {}
    for r in pts:
        by.setdefault(r["name"], []).append(r)
    # uptime: int(123456 / 100.0) = 1234 seconds, gauge
    (up,) = by["/system/uptime"]
    assert up["dval"] == 1234.0 and up["labels"]["datatype"] == "gauge"
    (cmd,) = by["/system/boot/kernel-commandline"]
    assert cmd["sval"] == "BOOT_IMAGE=/vmlinuz ro quiet"
    assert cmd["labels"]["datatype"] == "string"
    # the reference's own trailing slashes
    assert by["/system/num_users/"][0]["dval"] == 3.0
    assert by["/system/num_processes/"][0]["dval"] == 211.0
    # ram trio covers BOTH type .2 and type .3 rows, keyed by space label
    ram = {(r["labels"]["space"], r["name"]): r["dval"] for n in
           ["/system/ram/size", "/system/ram/used", "/system/ram/available"]
           for r in by[n]}
    assert ram[("Physical memory", "/system/ram/size")] == 16384 * 1024.0
    assert ram[("Physical memory", "/system/ram/available")] == 8192 * 1024.0
    assert ram[("Virtual memory", "/system/ram/used")] == 40 * 1024.0
    assert len(by["/system/ram/size"]) == 2
    # hrSystemDate is not mapped; fixed-disk rows don't leak into ram
    assert "/system/ram/size{space=/}" not in by
    assert len(pts) == 4 + 6


def test_hoststats_union_and_plan(spark):
    df = parse_snmp_hoststats(
        _walk(spark, IF_ROWS + HR_ROWS + SYS_ROWS), srchost="mon1"
    )
    assert df.count() == 8 + 3 + 10
    # pure JVM: no Python eval anywhere in the executed plan
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "Python" not in plan and "BatchEval" not in plan
