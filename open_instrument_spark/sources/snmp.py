"""S13 (final piece): SNMP host-stats table→variable mapping.

The reference ships a polling daemon (tools/snmp_hoststats.py) that
BulkGet-walks each configured host and maps three MIB subtrees onto
store variables:

- IF-MIB ifTable + ifXTable   → ``/network/interface/stats/<stat>``
  (snmp_hoststats.py:200-261 CollectInterfaceStats)
- HOST-RESOURCES hrStorageTable → ``/system/filesystem/{size,used,
  available}`` for fixed disks (snmp_hoststats.py:280-300) and
  ``/system/ram/{size,used,available}`` for ram/virtual-memory rows
  (snmp_hoststats.py:336-345)
- HOST-RESOURCES hrSystem walk → ``/system/uptime``,
  ``/system/boot/kernel-commandline``, ``/system/num_users/``,
  ``/system/num_processes/`` (snmp_hoststats.py:307-334; the trailing
  slashes on num_users/num_processes are the reference's own)

The BulkGet protocol walk is transport (a declared non-goal, like the
HTTP server); everything AFTER it — SnmpTable's index-row naming
(snmp_hoststats.py:136-155: ``index[oid[-1]] = title-field value``,
``rowname = index.get(oid[-1], oid[-1])``, ``item = oid[-2]``), the
high-capacity counter override (``hctable[ifindex][hcstat]`` keyed by
PivotTable on the numeric row index, :226-241), SNMP-type → datatype
label mapping (SetVarType :176-198: Counter32/64→counter, Gauge32→
gauge, Integer→integer, TimeTicks→integer+units=ticks, OctetString→
string, anything else dropped), MAC formatting (:169-174, exactly six
octets else dropped), the hrStorageType OID gates and block-size
multiplication, and the ``hostname``/``srchost`` label pair — is format
semantics, implemented here as pure column expressions (split/when/
pivot-style conditional aggregation/explode) plus one equi-join for the
HC override: JVM whole-stage codegen, stream-safe, no Python.

Input model: one row per walked binding —
``(hostname, ts, oid, value, vtype)`` where ``oid`` is the dotted
symbolic path the reference builds from the MIB view (label + numeric
suffix, e.g. ``...ifTable.ifEntry.ifInOctets.3``), ``value`` is the
binding rendered as a string (OctetStrings verbatim, OID values in
dotted-numeric form — the reference's ``OIDToString``), and ``vtype``
is the SNMP type name (``Counter32``/``Counter64``/``Gauge32``/
``Integer``/``TimeTicks``/``OctetString``).  ``ts`` is the scrape
timestamp, exactly as the reference stamps one ``time_ms`` per
collection pass.

Divergences (all places the reference CRASHES or corrupts, same policy
as sources/collectors.py):

- non-numeric value where ``int()``/``float()`` is applied
  (snmp_hoststats.py:259,288-299,326-332): uncaught ValueError in the
  reference; the row is SKIPPED here.
- hrStorage rows missing hrStorageType/AllocationUnits/Size/Used (or,
  for the ram trio, hrStorageDescr): uncaught KeyError; SKIPPED here.
- two table rows whose title-field values collide (e.g. duplicate
  ifDescr) are MERGED into one corrupted dict row by SnmpTable
  (:142-155, last item wins); here each numeric row index stays its own
  row and the duplicate name simply appears on two label sets.
- ``ifPhysAddress`` delivered as a non-OctetString numeric type feeds
  ``struct.unpack`` a non-string in the reference (uncaught TypeError);
  here the six-byte gate drops it.
"""

from __future__ import annotations

import platform

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_snmp_interface_stats",
    "parse_snmp_filesystem_stats",
    "parse_snmp_system_stats",
    "parse_snmp_hoststats",
]

# stats_to_keep: MIB field → high-speed (64-bit) override field
# (snmp_hoststats.py:203-223).
IF_STATS: dict[str, str | None] = {
    "ifAdminStatus": None,
    "ifDescr": None,
    "ifInDiscards": None,
    "ifInErrors": None,
    "ifInNUcastPkts": "ifHCInBroadcastPkts",
    "ifInOctets": "ifHCInOctets",
    "ifInUcastPkts": "ifHCInUcastPkts",
    "ifMtu": None,
    "ifOperStatus": None,
    "ifOutDiscards": None,
    "ifOutErrors": None,
    "ifOutNUcastPkts": "ifHCOutBroadcastPkts",
    "ifOutOctets": "ifHCOutOctets",
    "ifOutQLen": None,
    "ifOutUcastPkts": "ifHCOutUcastPkts",
    "ifSpeed": None,
    "ifType": None,
    "ifPhysAddress": None,
}

_HC_FIELDS = sorted({hc for hc in IF_STATS.values() if hc})

_HR_ITEMS = [
    "hrStorageType",
    "hrStorageDescr",
    "hrStorageAllocationUnits",
    "hrStorageSize",
    "hrStorageUsed",
]

# hrStorageType discriminators (dotted-numeric OID values).
_TYPE_FIXED_DISK = "1.3.6.1.2.1.25.2.1.4"   # snmp_hoststats.py:286
_TYPES_RAM = ["1.3.6.1.2.1.25.2.1.2", "1.3.6.1.2.1.25.2.1.3"]  # :338


def _srchost(srchost: Column | str | None) -> Column:
    """The collector's own hostname label (``platform.node()`` in the
    reference, snmp_hoststats.py:244); pass a literal for determinism."""
    if srchost is None:
        return F.lit(platform.node())
    return srchost if isinstance(srchost, Column) else F.lit(srchost)


def _oid_rows(walk: DataFrame) -> DataFrame:
    """Split each binding into (item, idx) = (oid[-2], oid[-1]).
    Bindings with fewer than two components are dropped
    (snmp_hoststats.py:145-146)."""
    f = F.split(F.col("oid"), r"\.")
    return walk.select(
        "hostname",
        "ts",
        "oid",
        "value",
        "vtype",
        F.when(F.size(f) >= 2, F.element_at(f, -2)).alias("item"),
        F.element_at(f, -1).alias("idx"),
    ).where(F.col("item").isNotNull())


def _pivot(rows: DataFrame, items: list[str]) -> DataFrame:
    """SnmpTable's dict-of-rows as conditional aggregation: one row per
    (host, ts, numeric index) carrying ``v_<item>``/``t_<item>`` value
    and SNMP-type columns. Explicit item list → fixed schema, one
    shuffle, pure hash aggregate (no pivot-API second pass)."""
    aggs = []
    for it in items:
        m = F.col("item") == F.lit(it)
        aggs.append(F.max(F.when(m, F.col("value"))).alias(f"v_{it}"))
        aggs.append(F.max(F.when(m, F.col("vtype"))).alias(f"t_{it}"))
    return rows.groupBy("hostname", "ts", "idx").agg(*aggs)


def _datatype(vt: Column) -> Column:
    """SetVarType's type → datatype label (snmp_hoststats.py:176-198);
    NULL means an unhandled type whose row is dropped."""
    return (
        F.when(vt.isin("Counter32", "Counter64"), F.lit("counter"))
        .when(vt == "Gauge32", F.lit("gauge"))
        .when(vt.isin("Integer", "TimeTicks"), F.lit("integer"))
        .when(vt == "OctetString", F.lit("string"))
    )


def _labels(srchost: Column, *pairs: tuple[str, Column]) -> Column:
    args: list[Column] = [
        F.lit("hostname"), F.col("hostname"),
        F.lit("srchost"), srchost,
    ]
    for k, v in pairs:
        args += [F.lit(k), v]
    return F.map_filter(F.create_map(*args), lambda _, v: v.isNotNull())


def _mac(val: Column) -> Column:
    """FormatMacAddress (snmp_hoststats.py:169-174): exactly six octets
    → colon-separated lowercase hex, else NULL (row dropped)."""
    b = F.encode(val, "ISO-8859-1")
    h = F.lower(F.hex(b))
    return F.when(
        F.length(b) == 6, F.regexp_replace(h, "(..)(?=.)", "$1:")
    )


def parse_snmp_interface_stats(
    walk: DataFrame, srchost: Column | str | None = None
) -> DataFrame:
    """ifTable/ifXTable walk rows → ``/network/interface/stats/<stat>``
    points (CollectInterfaceStats, snmp_hoststats.py:200-261).

    Shape: two conditional-aggregation pivots keyed (host, ts, row
    index) + one equi-join on (host, ts, ifIndex) for the 64-bit
    high-capacity override — at fleet scale both sides co-partition on
    the same keys, and everything stays in whole-stage codegen."""
    src = _srchost(srchost)
    rows = _oid_rows(walk)

    piv = _pivot(
        rows.where(F.col("oid").contains(".ifEntry.")),
        sorted(set(IF_STATS) | {"ifIndex"}),
    )
    # int(values['ifIndex']) — unparsable/missing → interface skipped
    # (snmp_hoststats.py:229-232).
    piv = piv.withColumn(
        "_ifidx", F.col("v_ifIndex").try_cast("long")
    ).where(F.col("_ifidx").isNotNull())
    # rowname: the row's title-field value, numeric index as fallback
    # (SnmpTable :147-150).
    piv = piv.withColumn("interface", F.coalesce("v_ifDescr", "idx"))

    xpiv = _pivot(
        rows.where(F.col("oid").contains(".ifXEntry.")), _HC_FIELDS
    ).select(
        F.col("hostname").alias("_xh"),
        F.col("ts").alias("_xts"),
        F.col("idx").try_cast("long").alias("_xidx"),
        *[F.col(f"v_{hc}").alias(f"xv_{hc}") for hc in _HC_FIELDS],
        *[F.col(f"t_{hc}").alias(f"xt_{hc}") for hc in _HC_FIELDS],
    ).where(F.col("_xidx").isNotNull())

    j = piv.join(
        xpiv,
        (F.col("hostname") == F.col("_xh"))
        & (F.col("ts") == F.col("_xts"))
        & (F.col("_ifidx") == F.col("_xidx")),
        "left",
    )

    # One struct per stats_to_keep entry; explode fans the joined row
    # out to points. ``orig`` gates presence (values[stat] KeyError →
    # continue, :234-237) BEFORE the HC override (:238-241) swaps in
    # the 64-bit value AND its SNMP type.
    entries = []
    for stat, hc in IF_STATS.items():
        v, t = F.col(f"v_{stat}"), F.col(f"t_{stat}")
        if hc:
            hv, ht = F.col(f"xv_{hc}"), F.col(f"xt_{hc}")
            val = F.coalesce(hv, v)
            vt = F.when(hv.isNotNull(), ht).otherwise(t)
        else:
            val, vt = v, t
        entries.append(
            F.struct(
                F.lit(stat).alias("stat"),
                v.alias("orig"),
                val.alias("val"),
                vt.alias("vt"),
            )
        )

    e = (
        j.select("hostname", "ts", "interface", F.explode(F.array(*entries)).alias("s"))
        .select(
            "hostname",
            "ts",
            "interface",
            F.col("s.stat").alias("stat"),
            F.col("s.val").alias("val"),
            F.col("s.vt").alias("vt"),
            F.col("s.orig").alias("orig"),
        )
        .where(F.col("orig").isNotNull())
    )

    dt = _datatype(F.col("vt"))
    is_mac = F.col("stat") == "ifPhysAddress"
    val2 = F.when(is_mac, _mac(F.col("val"))).otherwise(F.col("val"))
    e = e.select(
        "hostname", "ts", "interface", "stat",
        dt.alias("datatype"),
        F.when(F.col("vt") == "TimeTicks", F.lit("ticks")).alias("units"),
        val2.alias("val"),
    ).where(F.col("datatype").isNotNull() & F.col("val").isNotNull())

    dval = F.when(
        F.col("datatype") != "string", F.col("val").try_cast("double")
    )
    out = e.select(
        F.concat(F.lit("/network/interface/stats/"), F.col("stat")).alias("name"),
        _labels(
            src,
            ("interface", F.col("interface")),
            ("datatype", F.col("datatype")),
            ("units", F.col("units")),
        ).alias("labels"),
        "ts",
        dval.alias("dval"),
        F.when(F.col("datatype") == "string", F.col("val")).alias("sval"),
    )
    # float() crash divergence: numeric datatype whose value won't cast
    # is dropped, not emitted as a NULL point.
    return out.where(F.col("dval").isNotNull() | F.col("sval").isNotNull())


def _hr_pivot(walk: DataFrame) -> DataFrame:
    rows = _oid_rows(walk).where(F.col("oid").contains(".hrStorageEntry."))
    hr = _pivot(rows, _HR_ITEMS)
    return hr.select(
        "hostname",
        "ts",
        "idx",
        F.col("v_hrStorageType").alias("stype"),
        F.col("v_hrStorageDescr").alias("descr"),
        F.col("v_hrStorageAllocationUnits").try_cast("long").alias("bs"),
        F.col("v_hrStorageSize").try_cast("long").alias("size0"),
        F.col("v_hrStorageUsed").try_cast("long").alias("used0"),
    )


def _emit_trio(hr: DataFrame, prefix: str, labels: Column) -> DataFrame:
    """size/used/available with block-size multiplication
    (snmp_hoststats.py:288-300, 342-345). Rows whose int() inputs are
    missing/non-numeric are dropped (crash divergence)."""
    ok = hr.where(
        F.col("bs").isNotNull()
        & F.col("size0").isNotNull()
        & F.col("used0").isNotNull()
    )
    trio = F.array(
        F.struct(F.lit("size").alias("m"), (F.col("size0") * F.col("bs")).alias("v")),
        F.struct(F.lit("used").alias("m"), (F.col("used0") * F.col("bs")).alias("v")),
        F.struct(
            F.lit("available").alias("m"),
            ((F.col("size0") - F.col("used0")) * F.col("bs")).alias("v"),
        ),
    )
    return ok.select("hostname", "ts", labels.alias("labels"), F.explode(trio).alias("s")).select(
        F.concat(F.lit(prefix), F.col("s.m")).alias("name"),
        "labels",
        "ts",
        F.col("s.v").cast("double").alias("dval"),
        F.lit(None).cast("string").alias("sval"),
    )


def parse_snmp_filesystem_stats(
    walk: DataFrame, srchost: Column | str | None = None
) -> DataFrame:
    """hrStorageTable fixed-disk rows → ``/system/filesystem/*`` with a
    ``device`` label (CollectFilesystemStats, snmp_hoststats.py:280-300).
    No datatype label — these are plain double samples, as in the
    reference's brace-string AddValue."""
    src = _srchost(srchost)
    hr = _hr_pivot(walk).where(F.col("stype") == _TYPE_FIXED_DISK)
    labels = _labels(src, ("device", F.coalesce("descr", "idx")))
    return _emit_trio(hr, "/system/filesystem/", labels)


def parse_snmp_system_stats(
    walk: DataFrame, srchost: Column | str | None = None
) -> DataFrame:
    """hrSystem scalars + the ram/virtual-memory hrStorage rows
    (CollectSystemStats, snmp_hoststats.py:307-345)."""
    src = _srchost(srchost)
    rows = _oid_rows(walk).where(
        F.col("item").startswith("hrSystem") & (F.col("idx") == "0")
    )
    sys_piv = rows.groupBy("hostname", "ts").agg(
        *[
            F.max(F.when(F.col("item") == it, F.col("value"))).alias(it)
            for it in [
                "hrSystemUptime",
                "hrSystemInitialLoadParameters",
                "hrSystemNumUsers",
                "hrSystemProcesses",
            ]
        ]
    )

    gauge = lambda: _labels(src, ("datatype", F.lit("gauge")))  # noqa: E731
    # int(uptime / 100.0) — ticks → whole seconds, truncated (:317).
    uptime = sys_piv.select(
        F.lit("/system/uptime").alias("name"),
        gauge().alias("labels"),
        "ts",
        F.floor(F.col("hrSystemUptime").try_cast("double") / 100)
        .cast("double")
        .alias("dval"),
        F.lit(None).cast("string").alias("sval"),
    ).where(F.col("dval").isNotNull())
    cmdline = sys_piv.select(
        F.lit("/system/boot/kernel-commandline").alias("name"),
        _labels(src, ("datatype", F.lit("string"))).alias("labels"),
        "ts",
        F.lit(None).cast("double").alias("dval"),
        F.col("hrSystemInitialLoadParameters").alias("sval"),
    ).where(F.col("sval").isNotNull())
    scalars = [uptime, cmdline]
    # Trailing slashes are the reference's own variable names (:326,:331).
    for name, col in [
        ("/system/num_users/", "hrSystemNumUsers"),
        ("/system/num_processes/", "hrSystemProcesses"),
    ]:
        scalars.append(
            sys_piv.select(
                F.lit(name).alias("name"),
                gauge().alias("labels"),
                "ts",
                F.col(col).try_cast("bigint").cast("double").alias("dval"),
                F.lit(None).cast("string").alias("sval"),
            ).where(F.col("dval").isNotNull())
        )

    ram = _hr_pivot(walk).where(
        F.col("stype").isin(_TYPES_RAM) & F.col("descr").isNotNull()
    )
    ram_labels = _labels(
        src, ("datatype", F.lit("gauge")), ("space", F.col("descr"))
    )
    ram_trio = _emit_trio(ram, "/system/ram/", ram_labels)

    out = scalars[0]
    for df in scalars[1:] + [ram_trio]:
        out = out.unionByName(df)
    return out


def parse_snmp_hoststats(
    walk: DataFrame, srchost: Column | str | None = None
) -> DataFrame:
    """One collection pass, all three collectors — the reference's
    ``Run()`` order (system, interface, filesystem; :348-359).

    The walk feeds SEVEN-plus union branches across the three
    collectors (two interface pivots, two hrStorage pivots, the
    hrSystem pivot's four scalar projections); un-checkpointed, every
    branch re-executes the caller's walk lineage — for the synthesized
    collector queries that is one corpus scan + aggregate PER BRANCH.
    The checkpoint is walk-sized (one row per binding per host —
    fleet-scale, never corpus-scale), so each branch reads one
    materialization (guide §7.2 duplicated subtrees)."""
    walk = walk.localCheckpoint(eager=False)
    return (
        parse_snmp_system_stats(walk, srchost)
        .unionByName(parse_snmp_interface_stats(walk, srchost))
        .unionByName(parse_snmp_filesystem_stats(walk, srchost))
    )
