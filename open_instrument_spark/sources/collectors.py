"""S13: collector text-format parsers.

The reference ships cron-style collector scripts
(client/python/system_status.py, apache_status.py, mysql_status.py)
that scrape a local source — /proc files, the Apache mod_status
``?auto`` page, ``mysql -e "show status"`` output — turn each line
into Variable/Value streams via ``AddVar``, and ``Add()`` them to the
store.  The network/subprocess fetch is transport (a declared
non-goal, like the HTTP server); the FORMAT SEMANTICS — which lines
become which variables, label sets, unit scaling, ON/OFF mapping,
skip rules, counter/gauge datatype labels — are query surface, and
are what this module implements.

Spark-first shape: a scrape is a ROW ``(hostname, ts, payload)`` where
``payload`` is the raw text the reference script would have read.  Any
line source works — ``spark.read.text`` over scrape dumps, a
fetcher-produced table, or ``readStream`` for live feeds: every parser
here is pure column expressions (split/explode/regexp/when), so it runs
JVM-side inside whole-stage codegen, is stream-safe (no window, no
state), and feeds the same validate → dedup → write pipeline as every
other source (sources/ingest.py).  Output is the standard points
schema ``(name, labels, ts, dval, sval)``.

``AddVar`` parity (system_status.py:21-38, apache_status.py:16-33):
float-able values become double samples, everything else becomes a
string sample; a ``hostname`` label is always present (defaulted from
the scraping host).  Timestamps are assigned at scrape time — the
scrape row's ``ts`` — exactly as the reference stamps
``int(time.time() * 1000)`` per collection pass.

Divergences from the reference scripts (all are places the reference
CRASHES on malformed input because a 2-tuple unpack raises an
unhandled ValueError): /proc/diskstats lines without exactly 14
fields, ntpq peer lines without exactly 10, and apache ``key: value``
lines whose value contains another ``': '`` are SKIPPED-or-parsed
here instead of crashing (the apache case keeps the remainder as the
value).  Skips-by-design in the reference (mysql 3+ token lines,
non-numeric values, df headers) are reproduced exactly.

Further deliberate divergences on inputs where the reference raises
or mis-emits (r9, advisor follow-up):
- ``_num``-path parsers (meminfo, df, diskstats, net/dev, vmstat,
  loadavg, entropy): a non-numeric token where a number is expected
  makes the reference crash on ``float()``; here the ROW is dropped —
  we never emit the reference-impossible NULL-dval/NULL-sval point.
  parse_meminfo likewise drops non-numeric values rather than emitting
  them as string samples (meminfo values are kB counters; a
  non-numeric value is corruption, not data).
- parse_proc_stat skips ``cpu`` lines with fewer than 8 fields (the
  reference indexes fields[1:8] and would crash on a short line from
  an ancient kernel).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_mysql_status",
    "parse_apache_status",
    "parse_varnish_status",
    "parse_http_fetch",
    "parse_proc_stat",
    "parse_meminfo",
    "parse_df_blocks",
    "parse_df_inodes",
    "parse_diskstats",
    "parse_net_dev",
    "parse_loadavg",
    "parse_vmstat",
    "parse_entropy",
    "parse_ntpq",
    "parse_cisco_config",
]

_WS = r"\s+"


def _lines(scrapes: DataFrame) -> DataFrame:
    """One row per payload line, carrying (hostname, ts)."""
    return scrapes.select(
        "hostname", "ts", F.explode(F.split("payload", "\n")).alias("line")
    )


def _addvar(df: DataFrame, name: Column, labels: Column,
            raw: Column) -> DataFrame:
    """AddVar value semantics: float-able → double sample, else string
    sample (system_status.py:29-33)."""
    dval = raw.try_cast("double")
    return df.select(
        name.alias("name"),
        labels.alias("labels"),
        F.col("ts"),
        dval.alias("dval"),
        F.when(dval.isNull(), raw).alias("sval"),
    )


def _num(df: DataFrame, name: Column, labels: Column,
         dval: Column) -> DataFrame:
    """Emit an already-numeric sample (the ``float()``-before-AddVar
    collector paths; non-floatable lines were skipped upstream).

    A value that still fails the cast here (e.g. a non-numeric token in
    a later column of an otherwise well-formed df/diskstats/net_dev
    line) is DROPPED: the reference would raise on ``float()`` — a
    point with NULL dval and NULL sval is a shape it never produces,
    so we never emit one (see module docstring divergence list)."""
    d = dval.try_cast("double")
    return df.select(
        name.alias("name"),
        labels.alias("labels"),
        F.col("ts"),
        d.alias("dval"),
        F.lit(None).cast("string").alias("sval"),
    ).where(F.col("dval").isNotNull())


def _labels(*pairs: tuple[str, Column | str]) -> Column:
    """labels map incl. the AddVar hostname default. Values may be
    Columns or literal strings; None-valued entries are dropped by
    map_filter so optional labels (port) stay optional per-row."""
    args: list[Column] = [F.lit("hostname"), F.col("hostname")]
    for k, v in pairs:
        args.append(F.lit(k))
        args.append(v if isinstance(v, Column) else F.lit(v))
    m = F.create_map(*args)
    return F.map_filter(m, lambda _, v: v.isNotNull())


def _fields(line: Column) -> Column:
    return F.split(F.trim(line), _WS)


def _metric_rows(df: DataFrame, specs: list[tuple[str, int]],
                 col: str = "f") -> DataFrame:
    """Fan one parsed line out to (metric, raw) rows via a literal
    spec array — one explode, no per-metric scan."""
    spec = F.explode(
        F.array(
            *[
                F.struct(F.lit(m).alias("m"), F.lit(i).alias("i"))
                for m, i in specs
            ]
        )
    ).alias("s")
    return df.select("*", spec).select(
        "*",
        F.col("s.m").alias("metric"),
        F.element_at(F.col(col), F.col("s.i") + 1).alias("raw"),
    )


# ---------------------------------------------------------------------------
# mysql_status.py — `mysql -e "show status"` output
# ---------------------------------------------------------------------------

def parse_mysql_status(scrapes: DataFrame,
                       port: Column | str | None = None) -> DataFrame:
    """``show status`` lines → ``/database/mysql/status/<key>`` points
    (mysql_status.py:50-71).

    Exactly-two-token lines only (``re.split(r"\\s+", line, 2)`` then a
    2-tuple unpack — the header and any 3+-token line raise and are
    skipped); key lowercased; ``ON``/``OFF`` → 1/0; values that still
    don't parse as float are skipped.  Labels: hostname always, port
    when provided (mysql_status.py:64-67)."""
    kv = _lines(scrapes).select(
        "hostname",
        "ts",
        F.regexp_extract("line", r"^(\S+)\s+(\S+)$", 1).alias("key"),
        F.regexp_extract("line", r"^(\S+)\s+(\S+)$", 2).alias("val"),
    ).where(F.col("key") != "")
    dval = (
        F.when(F.col("val") == "ON", F.lit(1.0))
        .when(F.col("val") == "OFF", F.lit(0.0))
        .otherwise(F.col("val").try_cast("double"))
    )
    kv = kv.withColumn("dval", dval).where(F.col("dval").isNotNull())
    label_pairs: list[tuple[str, Column | str]] = []
    if port is not None:
        label_pairs.append(("port", port))
    return _num(
        kv,
        F.concat(F.lit("/database/mysql/status/"), F.lower("key")),
        _labels(*label_pairs),
        F.col("dval"),
    )


# ---------------------------------------------------------------------------
# apache_status.py — mod_status ?auto page
# ---------------------------------------------------------------------------

_APACHE_WORKER_TYPES = [
    ("_", "waiting"),
    ("S", "starting"),
    ("R", "reading"),
    ("W", "writing"),
    ("K", "keepalive"),
    ("D", "dns"),
    ("C", "closing"),
    ("L", "logging"),
    ("G", "lameduck"),
    ("I", "idle_cleanup"),
    (".", "open"),
]

# key → (metric, scale, units-label) per apache_status.py:73-90
_APACHE_KEYS = [
    ("Total Accesses", "hits", 1.0, None),
    ("Total kBytes", "bytes", 1024.0, "bytes"),
    ("CPULoad", "cpu_load", 1.0, None),
    ("Uptime", "uptime", 1.0, None),
    ("ReqPerSec", "req_per_sec", 1.0, None),
    ("BytesPerSec", "bytes_per_sec", 1.0, None),
    ("BytesPerReq", "bytes_per_req", 1.0, None),
    ("BusyWorkers", "busy_workers", 1.0, None),
    ("BusyServers", "busy_workers", 1.0, None),
    ("IdleWorkers", "idle_workers", 1.0, None),
    ("IdleServers", "idle_workers", 1.0, None),
]


def parse_apache_status(scrapes: DataFrame) -> DataFrame:
    """mod_status ``?auto`` page → ``/webserver/apache/*`` points
    (apache_status.py:35-94 GetServerStatus).

    ``key: value`` lines map through the known-key table (kBytes scaled
    ×1024 with a ``units=bytes`` label, ``BusyServers``/``IdleServers``
    aliased like the 2.2-era names); the ``Scoreboard`` line is counted
    character-by-character into the eleven worker_slots counters, which
    are emitted for EVERY scrape — zeros included — because the
    reference initializes the count dict before parsing
    (apache_status.py:37-63,92-94).  Unknown keys and unknown scoreboard
    characters are ignored."""
    lines = _lines(scrapes)
    kv = lines.select(
        "hostname",
        "ts",
        F.regexp_extract("line", r"^([^:]+): (.*)$", 1).alias("key"),
        F.regexp_extract("line", r"^([^:]+): (.*)$", 2).alias("val"),
    ).where(F.col("key") != "")

    name = F.lit(None).cast("string")
    scale = F.lit(None).try_cast("double")
    units = F.lit(None).cast("string")
    for key, metric, sc, un in reversed(_APACHE_KEYS):
        hit = F.col("key") == key
        name = F.when(hit, F.lit("/webserver/apache/" + metric)).otherwise(name)
        scale = F.when(hit, F.lit(sc)).otherwise(scale)
        units = F.when(hit, F.lit(un).cast("string")).otherwise(units)
    known = kv.select(
        "hostname", "ts", "val",
        name.alias("name"), scale.alias("scale"), units.alias("units"),
    ).where(F.col("name").isNotNull())
    # Total kBytes is float(value) * 1024 in the reference; every other
    # key passes through AddVar's float-else-string fallback.
    scaled = known.withColumn(
        "out",
        F.when(F.col("scale") == 1.0, F.col("val")).otherwise(
            (F.col("val").try_cast("double") * F.col("scale")).cast("string")
        ),
    )
    metrics = _addvar(
        scaled.where(F.col("out").isNotNull()),
        F.col("name"),
        _labels(("units", F.col("units"))),
        F.col("out"),
    )

    # Scoreboard: concat all Scoreboard-line values per scrape (counts
    # accumulate across lines), keep zero-count scrapes via a left join
    # from the scrape set.
    sb = (
        kv.where(F.col("key") == "Scoreboard")
        .groupBy("hostname", "ts")
        .agg(F.concat_ws("", F.collect_list("val")).alias("sb"))
    )
    per_scrape = scrapes.select("hostname", "ts").join(
        sb, ["hostname", "ts"], "left"
    ).withColumn("sb", F.coalesce("sb", F.lit("")))
    slot = F.explode(
        F.array(
            *[
                F.struct(F.lit(ch).alias("ch"), F.lit(slot).alias("slot"))
                for ch, slot in _APACHE_WORKER_TYPES
            ]
        )
    ).alias("s")
    counts = per_scrape.select("*", slot).select(
        "hostname",
        "ts",
        F.concat(F.lit("/webserver/apache/worker_slots/"), F.col("s.slot")).alias("n"),
        (
            F.length("sb")
            - F.length(F.replace(F.col("sb"), F.col("s.ch"), F.lit("")))
        ).alias("c"),
    )
    slots = _num(counts, F.col("n"), _labels(), F.col("c"))
    return metrics.unionByName(slots)


# ---------------------------------------------------------------------------
# varnish_status.py — `varnishstat -1` dump
# ---------------------------------------------------------------------------

_VBE_RE = r"^vbe\.([^(]+)\(([^)]+)\)\.(.+)$"


def parse_varnish_status(scrapes: DataFrame) -> DataFrame:
    """``varnishstat -1`` counter dump → ``/varnish/status/*`` points
    (varnish_status.py:38-64).

    Each line splits as ``key value rate description`` (``re.split``
    maxsplit=3 — lines with fewer than four fields raise-and-skip in
    the reference); the key is lowercased. VBE backend keys
    ``vbe.<director>(<host>,<x>,<port>).<metric>`` become
    ``/varnish/status/director/<director>/<metric>`` with ``backend``
    / ``backend_port`` labels (varnish_status.py:44-51); every other
    key maps dots → underscores under ``/varnish/status/``
    (varnish_status.py:52-54, note the director branch keeps its dots).
    Values that fail ``float()`` are skipped with the pass continuing
    (varnish_status.py:55-60 — this script sets double_value directly,
    no AddVar string fallback). Labels: hostname always.

    D15 discipline: a VBE address part without exactly three comma
    fields would crash the reference's 3-tuple unpack
    (varnish_status.py:46) and is SKIPPED here instead. The
    reference's VBE regex (varnish_status.py:43) leaves the dot
    between ``)`` and the metric unescaped, so ``vbe.d(a,b,c)Xmetric``
    (any separator char) is accepted as a director line with the X
    silently swallowed — ours escapes it (advisor r11), and such a
    key therefore falls through to the generic dots→underscores
    branch, exactly where the reference's own else-arm would send a
    non-matching key. A line with
    LEADING whitespace (impossible in real varnishstat -1 output —
    names are left-justified) is also skipped, where the reference's
    ``re.split`` would shift fields and emit an empty-keyed
    ``/varnish/status/`` variable from the description words."""
    kv = _lines(scrapes).select(
        "hostname", "ts",
        F.lower(F.regexp_extract(
            "line", r"^(\S+)\s+(\S+)\s+(\S+)\s+(.+)$", 1)).alias("key"),
        F.regexp_extract(
            "line", r"^(\S+)\s+(\S+)\s+(\S+)\s+(.+)$", 2).alias("val"),
    ).where(F.col("key") != "")
    kv = kv.withColumn("dval", F.col("val").try_cast("double")).where(
        F.col("dval").isNotNull()
    )
    director = F.regexp_extract("key", _VBE_RE, 1)
    addr = F.split(F.regexp_extract("key", _VBE_RE, 2), ",")
    metric = F.regexp_extract("key", _VBE_RE, 3)
    vbe = kv.where(
        (director != "") & (F.size(addr) == 3)
    ).withColumn("backend", addr.getItem(0)).withColumn(
        "backend_port", addr.getItem(2)
    )
    vbe_out = _num(
        vbe,
        F.concat(F.lit("/varnish/status/director/"), director,
                 F.lit("/"), metric),
        _labels(("backend", F.col("backend")),
                ("backend_port", F.col("backend_port"))),
        F.col("dval"),
    )
    plain = kv.where(director == "")
    plain_out = _num(
        plain,
        F.concat(F.lit("/varnish/status/"),
                 F.replace(F.col("key"), F.lit("."), F.lit("_"))),
        _labels(),
        F.col("dval"),
    )
    return vbe_out.unionByName(plain_out)


# ---------------------------------------------------------------------------
# http_fetch_status.py — URL timing probe
# ---------------------------------------------------------------------------

def parse_http_fetch(fetches: DataFrame) -> DataFrame:
    """HTTP fetch probe results → ``/http_fetch/{time,status}`` points
    (http_fetch_status.py:46-58).

    The reference script IS the probe — it urlopens each URL and emits
    the elapsed seconds and the status code; the network I/O is
    transport (like every collector's subprocess/socket layer), the
    emitted variable shapes are query surface. Input here is one row
    per completed fetch ``(hostname, ts, url, time_s, status)`` where
    ``ts`` is the fetch START (the reference stamps
    ``int(start_time * 1000)``, http_fetch_status.py:55,57).

    Both variables carry ``datatype=gauge, units=seconds, url=<url>``
    — yes, ``units=seconds`` on the status code too, reproducing the
    reference's copy-pasted label dict (http_fetch_status.py:56-58);
    the status code goes through AddVar's float path so it lands as a
    double sample."""
    lbl = _labels(
        ("datatype", "gauge"), ("units", "seconds"), ("url", F.col("url"))
    )
    time_out = _num(
        fetches, F.lit("/http_fetch/time"), lbl, F.col("time_s")
    )
    status_out = _num(
        fetches, F.lit("/http_fetch/status"), lbl,
        F.col("status").cast("double"),
    )
    return time_out.unionByName(status_out)


# ---------------------------------------------------------------------------
# system_status.py — /proc and friends
# ---------------------------------------------------------------------------

_CPU_METRICS = [
    ("user", 1), ("nice", 2), ("system", 3), ("idle", 4),
    ("iowait", 5), ("irq", 6), ("softirq", 7),
]


def parse_proc_stat(scrapes: DataFrame, hz: float = 100.0) -> DataFrame:
    """/proc/stat → ``/system/stats/*`` (system_status.py:41-91
    GetCpuStats).

    cpu/cpuN lines: the first seven jiffy counters ÷ HZ (extra fields
    beyond seven are dropped, the maxsplit path), labels
    ``cpu=total|N, datatype=counter, units=seconds``; ``intr`` and
    ``softirq`` emit their totals (plus per-index softirq counters);
    ``btime`` becomes ``/system/stats/uptime`` = scrape time − boot
    time (gauge); processes/procs_* map per the reference."""
    # Checkpoint the split-lines frame: it feeds NINE parser branches
    # (cpu, intr, ctxt, btime, three process counters, softirq total +
    # per-index), each of which re-executed the scrape scan + line
    # split + field split (9 parquet scans in the collector_proc_stat
    # plan). One walk-sized materialization feeds all branches — the
    # snmp-walk / collector-aggregate checkpoint pattern (r14 #8/#11,
    # guide §7.2); lines-per-scrape is fleet-scale, never corpus-scale.
    rows = _lines(scrapes).select(
        "hostname", "ts", _fields(F.col("line")).alias("f")
    ).where(F.size("f") >= 2).withColumn(
        "key", F.col("f").getItem(0)
    ).localCheckpoint(eager=False)

    cpu = rows.where(
        F.col("key").rlike("^cpu") & (F.size("f") >= 8)
    ).withColumn(
        "cpu",
        F.when(F.length("key") > 3, F.expr("substring(key, 4)")).otherwise(
            F.lit("total")
        ),
    )
    cpu_lbl = _labels(
        ("cpu", F.col("cpu")), ("datatype", "counter"), ("units", "seconds")
    )
    cpu_out = _num(
        _metric_rows(cpu, _CPU_METRICS),
        F.concat(F.lit("/system/stats/cpu_stats/"), F.col("metric")),
        cpu_lbl,
        F.col("raw").try_cast("double") / F.lit(hz),
    )

    v1 = F.col("f").getItem(1)
    intr = _num(
        rows.where(F.col("key") == "intr"),
        F.lit("/system/stats/cpu_stats/interrupts"),
        _labels(("interrupt", "total"), ("datatype", "counter")),
        v1,
    )
    ctxt = _num(
        rows.where(F.col("key") == "ctxt"),
        F.lit("/system/stats/cpu_stats/context_switches"),
        _labels(("datatype", "counter")),
        v1,
    )
    uptime = _num(
        rows.where(F.col("key") == "btime"),
        F.lit("/system/stats/uptime"),
        _labels(("datatype", "gauge")),
        F.unix_timestamp("ts") - v1.try_cast("double"),
    )
    simple = [
        ("processes", "/system/stats/processes_started", "counter"),
        ("procs_blocked", "/system/stats/processes_blocked", "gauge"),
        ("procs_running", "/system/stats/processes_running", "gauge"),
    ]
    simples = [
        _num(
            rows.where(F.col("key") == k),
            F.lit(n),
            _labels(("datatype", dt)),
            v1,
        )
        for k, n, dt in simple
    ]
    sirq_rows = rows.where(F.col("key") == "softirq")
    sirq_total = _num(
        sirq_rows,
        F.lit("/system/stats/softirq"),
        _labels(("irq", "total"), ("datatype", "counter")),
        v1,
    )
    per_irq = sirq_rows.select(
        "hostname",
        "ts",
        F.posexplode(F.slice(F.col("f"), 3, F.size("f"))).alias("pos", "raw"),
    )
    sirq_each = _num(
        per_irq,
        F.lit("/system/stats/softirq"),
        _labels(("irq", F.col("pos").cast("string")), ("datatype", "counter")),
        F.col("raw"),
    )
    out = cpu_out
    for part in [intr, ctxt, uptime, *simples, sirq_total, sirq_each]:
        out = out.unionByName(part)
    return out


def parse_meminfo(scrapes: DataFrame) -> DataFrame:
    """/proc/meminfo → ``/system/memory/<key>`` gauges
    (system_status.py:201-215 GetMemoryStats): key lowercased with
    parens → underscores; a leading ``<digits> kB``/``MB`` value is
    scaled ×1024/×1024²; other two-char units fall back to the bare
    number; unscaled numerics pass through; non-numeric lines are
    skipped."""
    kv = _lines(scrapes).select(
        "hostname",
        "ts",
        F.regexp_extract("line", r"^([^:]+):\s+(.*)$", 1).alias("key"),
        F.trim(F.regexp_extract("line", r"^([^:]+):\s+(.*)$", 2)).alias("val"),
    ).where(F.col("key") != "")
    num = F.regexp_extract("val", r"^(\d+) (..)", 1)
    unit = F.regexp_extract("val", r"^(\d+) (..)", 2)
    dval = (
        F.when(unit == "kB", num.try_cast("double") * 1024.0)
        .when(unit == "MB", num.try_cast("double") * 1024.0 * 1024.0)
        .when(unit != "", num.try_cast("double"))
        .otherwise(F.col("val").try_cast("double"))
    )
    kv = kv.withColumn("dval", dval).where(F.col("dval").isNotNull())
    key = F.regexp_replace(F.lower(F.trim("key")), r"[()]", "_")
    return _num(
        kv,
        F.concat(F.lit("/system/memory/"), key),
        _labels(("datatype", "gauge")),
        F.col("dval"),
    )


_DF_RE = r"^(\S+)\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)\s+(.*)$"


def _df_rows(scrapes: DataFrame) -> DataFrame:
    ex = [F.regexp_extract("line", _DF_RE, i).alias(c) for i, c in enumerate(
        ["fs", "a", "b", "c", "cap", "mnt"], start=1)]
    return _lines(scrapes).select("hostname", "ts", *ex).where(
        F.col("fs") != ""
    )


def parse_df_blocks(scrapes: DataFrame) -> DataFrame:
    """``df -P -l`` output → ``/system/filesystem/{size,used,available}``
    in bytes (×1024, system_status.py:94-111): six fields with the
    mountpoint absorbing trailing spaces (maxsplit=5); the header line
    skips itself because its size column is not a float."""
    rows = _df_rows(scrapes).where(F.col("a").try_cast("double").isNotNull())
    lbl = _labels(
        ("device", F.col("fs")), ("mountpoint", F.col("mnt")),
        ("datatype", "gauge"), ("units", "bytes"),
    )
    out = None
    for col, metric in [("a", "size"), ("b", "used"), ("c", "available")]:
        part = _num(
            rows,
            F.lit("/system/filesystem/" + metric),
            lbl,
            F.col(col).try_cast("double") * 1024.0,
        )
        out = part if out is None else out.unionByName(part)
    return out


def parse_df_inodes(scrapes: DataFrame) -> DataFrame:
    """``df -P -l -i`` output → ``/system/filesystem/inodes_*`` gauges
    (system_status.py:113-131): integer fields, zero-inode filesystems
    skipped (``int(inodes) == 0 → continue``), ``units=inodes``."""
    rows = _df_rows(scrapes).withColumn("i", F.col("a").try_cast("long")).where(
        F.col("i").isNotNull() & (F.col("i") != 0)
    )
    lbl = _labels(
        ("device", F.col("fs")), ("mountpoint", F.col("mnt")),
        ("datatype", "gauge"), ("units", "inodes"),
    )
    out = None
    for col, metric in [
        ("a", "inodes_total"), ("b", "inodes_used"), ("c", "inodes_available")
    ]:
        part = _num(
            rows, F.lit("/system/filesystem/" + metric), lbl,
            F.col(col).try_cast("double"),
        )
        out = part if out is None else out.unionByName(part)
    return out


_DISK_METRICS = [
    ("reads", 3), ("reads_merged", 4), ("writes", 7), ("writes_merged", 8),
    ("sectors_read", 5), ("sectors_written", 9),
    ("ms_reading", 6), ("ms_writing", 10),
]


def parse_diskstats(scrapes: DataFrame) -> DataFrame:
    """/proc/diskstats → ``/system/disk_stats/*`` counters
    (system_status.py:135-154 GetDiskStats): the 2.6-era 14-field
    layout; devices with the STRING ``'0'`` in both the reads and
    writes columns are skipped.  Lines without exactly 14 fields are
    skipped here (the reference's bare unpack would crash on them)."""
    rows = _lines(scrapes).select(
        "hostname", "ts", _fields(F.col("line")).alias("f")
    ).where(
        (F.size("f") == 14)
        & ~((F.col("f").getItem(3) == "0") & (F.col("f").getItem(7) == "0"))
    )
    lbl = _labels(
        ("device", F.col("f").getItem(2)), ("datatype", "counter")
    )
    return _num(
        _metric_rows(rows, _DISK_METRICS),
        F.concat(F.lit("/system/disk_stats/"), F.col("metric")),
        lbl,
        F.col("raw"),
    )


_NET_COUNTERS = [
    ("read_bytes", 1), ("read_packets", 2), ("read_errors", 3),
    ("read_drop", 4), ("read_frame", 6), ("read_compressed", 7),
    ("read_multicast", 8), ("write_bytes", 9), ("write_packets", 10),
    ("write_errors", 11), ("write_drop", 12), ("write_collisions", 14),
    ("write_compressed", 16), ("write_carrier", 15),
]
_NET_GAUGES = [("read_fifo", 5), ("write_fifo", 13)]


def parse_net_dev(scrapes: DataFrame) -> DataFrame:
    """/proc/net/dev → ``/network/interface/stats/*``
    (system_status.py:171-199 GetInterfaceStats): lines matching
    ``\\w+:``, seventeen fields (iface + 16 counters); fourteen emit
    with ``datatype=counter`` and the two fifo columns with
    ``datatype=gauge`` (the reference flips the shared label dict
    before the fifo AddVars)."""
    rows = _lines(scrapes).where(
        F.trim("line").rlike(r"^\w+:")
    ).select(
        "hostname", "ts", _fields(F.col("line")).alias("f")
    ).where(F.size("f") == 17).withColumn(
        "iface", F.regexp_replace(F.col("f").getItem(0), ":+$", "")
    )

    def emit(specs: list[tuple[str, int]], datatype: str) -> DataFrame:
        lbl = _labels(
            ("datatype", datatype), ("interface", F.col("iface"))
        )
        return _num(
            _metric_rows(rows, specs),
            F.concat(F.lit("/network/interface/stats/"), F.col("metric")),
            lbl,
            F.col("raw"),
        )

    return emit(_NET_COUNTERS, "counter").unionByName(emit(_NET_GAUGES, "gauge"))


def parse_loadavg(scrapes: DataFrame) -> DataFrame:
    """/proc/loadavg first field → ``/system/load_average`` gauge
    (system_status.py:157-160)."""
    rows = scrapes.select(
        "hostname", "ts",
        F.split(F.col("payload"), " ", 2).getItem(0).alias("v"),
    ).where(F.col("v") != "")
    return _addvar(
        rows, F.lit("/system/load_average"), _labels(("datatype", "gauge")),
        F.col("v"),
    )


def parse_vmstat(scrapes: DataFrame) -> DataFrame:
    """/proc/vmstat ``key value`` lines → ``/system/vmstat/<key>``
    (system_status.py:231-235; no datatype label in the reference)."""
    kv = _lines(scrapes).select(
        "hostname",
        "ts",
        F.regexp_extract("line", r"^(\S+) (\S+)$", 1).alias("key"),
        F.regexp_extract("line", r"^(\S+) (\S+)$", 2).alias("val"),
    ).where(F.col("key") != "")
    return _addvar(
        kv, F.concat(F.lit("/system/vmstat/"), F.col("key")), _labels(),
        F.col("val"),
    )


def parse_entropy(scrapes: DataFrame) -> DataFrame:
    """/proc/sys/kernel/random/entropy_avail →
    ``/system/random/entropy_available`` gauge
    (system_status.py:163-167)."""
    rows = scrapes.select(
        "hostname", "ts", F.trim(F.col("payload")).alias("v")
    ).where(F.col("v") != "")
    return _addvar(
        rows,
        F.lit("/system/random/entropy_available"),
        _labels(("datatype", "gauge")),
        F.col("v"),
    )


_NTP_FIELDS = ["remote", "refid", "st", "t", "when", "poll", "reach",
               "delay", "offset", "jitter"]


def parse_ntpq(scrapes: DataFrame) -> DataFrame:
    """``ntpq -n -p`` output → ``/ntp/{delay,offset,jitter}`` gauges in
    seconds (system_status.py:218-229 GetNtpStats): only the
    ``*``-prefixed sync peer line is read; delay/offset/jitter are
    ms ÷ 1000, labels ``remote=<peer>, units=seconds``.  Lines without
    exactly 10 fields after the ``*`` are skipped (the reference's
    bare unpack would crash)."""
    rows = _lines(scrapes).where(F.col("line").startswith("*")).select(
        "hostname", "ts",
        _fields(F.expr("substring(line, 2)")).alias("f"),
    ).where(F.size("f") == 10)
    rows = rows.withColumn("remote", F.col("f").getItem(0))
    lbl = _labels(
        ("datatype", "gauge"), ("remote", F.col("remote")),
        ("units", "seconds"),
    )
    out = None
    for metric, idx in [("delay", 7), ("offset", 8), ("jitter", 9)]:
        part = _num(
            rows,
            F.lit("/ntp/" + metric),
            lbl,
            F.col("f").getItem(idx).try_cast("double") / 1000.0,
        )
        out = part if out is None else out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# cisco_config.py — device-config snapshot as a STRING sample
# ---------------------------------------------------------------------------

# leading junk (cisco_config.py:38-39): blank, prompt echoes of
# "term length 0" / the show command, or a bare "Building
# configuration..." line (re.search with the trailing $: the prompt
# alternatives match line SUFFIXES, the Building alternative the whole
# line)
_CC_LEAD_RE = r"(#term length 0|#show running-config)$"
_CC_BUILDING_RE = r"^Building configuration\.\.\.$"
_CC_BLANK_RE = r"^ *$"


def parse_cisco_config(captures: DataFrame) -> DataFrame:
    """Telnet ``show running-config`` capture → ONE
    ``/network/device/configuration{device_type=cisco,hostname=h}``
    STRING sample holding the whole config blob
    (cisco_config.py:25-41,94-103) — the reference's only multi-KB
    sval producer, the shape config.txt:37-47's daily-LATEST string
    retention exists for.

    Input: (hostname, ts, raw) where ``raw`` is the full telnet
    capture, lines joined with CRLF (telnetlib's read_all framing,
    cisco_config.py:35). Trimming mirrors the reference's pop loops
    exactly (cisco_config.py:36-41): drop TRAILING lines that are
    blank or end with ``#exit``; drop LEADING lines that are blank,
    end with the prompt echoes, or are ``Building configuration...``;
    interior junk survives (the pops stop at the first keeper from
    each end — equivalently, keep [min non-lead-junk index, max
    non-trail-junk index]). The kept lines are joined with NO
    separator — ``"".join(config)`` on the line LIST is the
    reference's own quirk (cisco_config.py:102; its SNMP path ships
    the file verbatim instead) — and captures with fewer than six
    kept lines are dropped (``not len(config) > 5``,
    cisco_config.py:60 — a failed login's residue is not a config).

    All-junk captures yield NULL bounds and are filtered with the
    same guard; pure JVM expressions (one transform per bound +
    array_min/array_max, which skip NULL elements)."""
    arr = F.split(F.col("raw"), "\r\n")

    def lead_junk(x):
        return (x.rlike(_CC_BLANK_RE) | x.rlike(_CC_LEAD_RE)
                | x.rlike(_CC_BUILDING_RE))

    def trail_junk(x):
        return x.rlike(_CC_BLANK_RE) | x.endswith("#exit")

    bounds = captures.select(
        "hostname", "ts", arr.alias("a"),
        F.array_min(F.transform(
            arr, lambda x, i: F.when(~lead_junk(x), i))).alias("lo"),
        F.array_max(F.transform(
            arr, lambda x, i: F.when(~trail_junk(x), i))).alias("hi"),
    ).where((F.col("hi") - F.col("lo") + 1) > 5)
    return bounds.select(
        F.lit("/network/device/configuration").alias("name"),
        _labels(("device_type", "cisco")).alias("labels"),
        F.col("ts"),
        F.lit(None).cast("double").alias("dval"),
        F.array_join(
            F.slice(F.col("a"), F.col("lo") + 1,
                    F.col("hi") - F.col("lo") + 1), "").alias("sval"),
    )
