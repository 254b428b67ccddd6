"""S13 collector queries: deterministic status payloads are synthesized
from the events table, pushed through the REAL format parsers
(sources/collectors.py), and hash-gated against DuckDB oracles that
compute the expected points DIRECTLY from the same aggregates — a
mismatch anywhere in the synth → parse path goes red.

Reference: client/python/{mysql,apache,system}_status.py (see the
parser module for line-level citations)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from open_instrument_spark.model import series_key
from open_instrument_spark.registry_base import NOW, query
from open_instrument_spark.session import prepare
from open_instrument_spark.sources import collectors as C
from open_instrument_spark.sources.tables import load_tables

_TS = f"TIMESTAMP '{NOW}'"


def _scrape(agg: DataFrame, prefix: str, payload: Column) -> DataFrame:
    return agg.select(
        F.concat(F.lit(prefix), F.col("h").cast("string")).alias("hostname"),
        F.lit(NOW).cast("timestamp").alias("ts"),
        payload.alias("payload"),
    )


def _out(pts: DataFrame) -> DataFrame:
    return pts.select(series_key().alias("series_key"), "ts", "dval")


# ---------------------------------------------------------------------------
# mysql `show status`
# ---------------------------------------------------------------------------

@query(
    "collector_mysql_status",
    oracle=f"""
WITH c AS (
  SELECT CAST(user_id AS BIGINT) % 4 AS h, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
t AS (SELECT h, SUM(n) AS tot FROM c GROUP BY h)
SELECT '/database/mysql/status/com_' || lower(event_type) ||
       '{{hostname=db' || h || ',port=3306}}' AS series_key,
       {_TS} AS ts, CAST(n AS DOUBLE) AS dval
FROM c
UNION ALL
SELECT '/database/mysql/status/innodb_rows_read{{hostname=db' || h ||
       ',port=3306}}', {_TS}, CAST(tot AS DOUBLE) FROM t
UNION ALL
SELECT '/database/mysql/status/have_ssl{{hostname=db' || h ||
       ',port=3306}}', {_TS}, 1.0 FROM t
UNION ALL
SELECT '/database/mysql/status/have_query_cache{{hostname=db' || h ||
       ',port=3306}}', {_TS}, 0.0 FROM t
""",
)
def collector_mysql_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 mysql collector: per-host `show status` payloads (Com_*
    counters from events, planted ON/OFF/header/non-numeric lines)
    parsed by parse_mysql_status; the header, the string-valued
    Version_comment, and 3-token lines must all be skipped, ON/OFF
    must map to 1/0, keys must lowercase (mysql_status.py:50-71)."""
    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    per_type = ev.groupBy(
        (F.col("user_id") % 4).alias("h"), "event_type"
    ).agg(F.count("*").alias("n")).localCheckpoint(eager=False)
    # (r14, guide §7.2) host×type-sized; feeds the Com_* lines AND the
    # planted-total branch — un-checkpointed, two events scans.
    lines_t = per_type.select(
        "h",
        F.concat(
            F.lit("Com_"), F.col("event_type"), F.lit("\t"),
            F.col("n").cast("string"),
        ).alias("line"),
    )
    tot = per_type.groupBy("h").agg(F.sum("n").alias("tot"))
    planted = tot.select(
        "h",
        F.explode(
            F.array(
                F.lit("Variable_name\tValue"),
                F.lit("Have_ssl\tON"),
                F.lit("Have_query_cache\tOFF"),
                F.lit("Version_comment\tMySQL Community Server"),
                F.concat(
                    F.lit("Innodb_rows_read\t"), F.col("tot").cast("string")
                ),
            )
        ).alias("line"),
    )
    agg = lines_t.unionByName(planted).groupBy("h").agg(
        F.concat_ws("\n", F.sort_array(F.collect_list("line"))).alias("payload")
    )
    pts = C.parse_mysql_status(
        _scrape(agg, "db", F.col("payload")), port=F.lit("3306")
    )
    return _out(pts)


# ---------------------------------------------------------------------------
# apache mod_status ?auto
# ---------------------------------------------------------------------------

_APACHE_DERIVED = """
a AS (
  SELECT CAST(user_id AS BIGINT) % 3 AS h, COUNT(*) AS n
  FROM events GROUP BY 1
),
d AS (
  SELECT h, n, n % 1000 AS kb, n % 11 AS busy, n % 17 AS idle,
         n % 5 AS keep, n % 13 AS opn, n % 90 + 10 AS cpufrac
  FROM a
)
"""


@query(
    "collector_apache_scoreboard",
    oracle=f"""
WITH {_APACHE_DERIVED}
SELECT '/webserver/apache/hits{{hostname=web' || h || '}}' AS series_key,
       {_TS} AS ts, CAST(n AS DOUBLE) AS dval FROM d
UNION ALL
SELECT '/webserver/apache/bytes{{hostname=web' || h || ',units=bytes}}',
       {_TS}, CAST(kb AS DOUBLE) * 1024.0 FROM d
UNION ALL
SELECT '/webserver/apache/cpu_load{{hostname=web' || h || '}}',
       {_TS}, CAST('0.' || cpufrac AS DOUBLE) FROM d
UNION ALL
SELECT '/webserver/apache/uptime{{hostname=web' || h || '}}',
       {_TS}, CAST(n * 13 AS DOUBLE) FROM d
UNION ALL
SELECT '/webserver/apache/busy_workers{{hostname=web' || h || '}}',
       {_TS}, CAST(busy AS DOUBLE) FROM d
UNION ALL
SELECT '/webserver/apache/idle_workers{{hostname=web' || h || '}}',
       {_TS}, CAST(idle AS DOUBLE) FROM d
UNION ALL
SELECT '/webserver/apache/worker_slots/' || s.slot ||
       '{{hostname=web' || h || '}}', {_TS},
       CAST(CASE s.slot WHEN 'waiting' THEN idle WHEN 'writing' THEN busy
                        WHEN 'keepalive' THEN keep WHEN 'open' THEN opn
                        ELSE 0 END AS DOUBLE)
FROM d CROSS JOIN (
  SELECT UNNEST(['waiting','starting','reading','writing','keepalive',
                 'dns','closing','logging','lameduck','idle_cleanup',
                 'open']) AS slot
) s
""",
)
def collector_apache_scoreboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 apache collector: per-host ?auto payloads (metrics + a
    scoreboard string built by repeat()) through parse_apache_status —
    gates the known-key table, the kBytes ×1024 scaling + units label,
    the BusyServers/IdleServers 2.2 aliases, character-exact scoreboard
    slot counting with unknown characters ignored, and the
    always-emitted zero slots (apache_status.py:35-94)."""
    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    d = ev.groupBy((F.col("user_id") % 3).alias("h")).agg(
        F.count("*").alias("n")
    ).select(
        "h", "n",
        (F.col("n") % 1000).alias("kb"),
        (F.col("n") % 11).alias("busy"),
        (F.col("n") % 17).alias("idle"),
        (F.col("n") % 5).alias("keep"),
        (F.col("n") % 13).alias("opn"),
        (F.col("n") % 90 + 10).alias("cpufrac"),
    )
    s = F.col  # brevity
    scoreboard = F.concat(
        F.expr("repeat('_', idle)"),
        F.expr("repeat('W', busy)"),
        F.expr("repeat('K', keep)"),
        F.expr("repeat('.', opn)"),
        F.lit("X"),  # not a worker type: must be ignored
    )
    payload = F.concat_ws(
        "\n",
        F.concat(F.lit("Total Accesses: "), s("n").cast("string")),
        F.concat(F.lit("Total kBytes: "), s("kb").cast("string")),
        F.concat(F.lit("CPULoad: 0."), s("cpufrac").cast("string")),
        F.concat(F.lit("Uptime: "), (s("n") * 13).cast("string")),
        F.concat(F.lit("BusyServers: "), s("busy").cast("string")),
        F.concat(F.lit("IdleServers: "), s("idle").cast("string")),
        F.concat(F.lit("Scoreboard: "), scoreboard),
        F.lit("ExtraUnknown: 42"),  # unknown key: dropped
    )
    pts = C.parse_apache_status(_scrape(d, "web", payload))
    return _out(pts)


# ---------------------------------------------------------------------------
# varnishstat -1
# ---------------------------------------------------------------------------

@query(
    "collector_varnish_status",
    oracle=f"""
WITH a AS (
  SELECT CAST(user_id AS BIGINT) % 3 AS h, COUNT(*) AS n
  FROM events GROUP BY 1
)
SELECT '/varnish/status/client_conn{{hostname=cache' || h || '}}'
       AS series_key, {_TS} AS ts, CAST(n AS DOUBLE) AS dval FROM a
UNION ALL
SELECT '/varnish/status/cache_hit{{hostname=cache' || h || '}}',
       {_TS}, CAST(n % 1000 AS DOUBLE) FROM a
UNION ALL
SELECT '/varnish/status/main_uptime{{hostname=cache' || h || '}}',
       {_TS}, CAST(n % 86400 AS DOUBLE) FROM a
UNION ALL
SELECT '/varnish/status/director/default/happy{{backend=10.0.0.' || h ||
       ',backend_port=8080,hostname=cache' || h || '}}',
       {_TS}, CAST(n % 64 AS DOUBLE) FROM a
UNION ALL
SELECT '/varnish/status/vbe_d(a,b,c)xmetric{{hostname=cache' || h || '}}',
       {_TS}, CAST(7 AS DOUBLE) FROM a
""",
)
def collector_varnish_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 varnish collector (the last named reference collector text
    format): per-host ``varnishstat -1`` payloads — plain counters, a
    dotted MAIN.uptime key (dots → underscores), an UPPERCASE VBE
    backend line (lowercasing + director/metric split + backend labels),
    a non-float value, a short line, and a malformed VBE address (the
    reference's crash case, skipped per D15) — through
    parse_varnish_status (varnish_status.py:38-64)."""
    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    d = ev.groupBy((F.col("user_id") % 3).alias("h")).agg(
        F.count("*").alias("n")
    )

    def cat(*parts):
        return F.concat(*[
            p if isinstance(p, Column) else F.lit(p) for p in parts
        ])

    hs = F.col("h").cast("string")
    payload = F.concat_ws(
        "\n",
        cat("client_conn ", F.col("n").cast("string"),
            " 1.23 Client connections accepted"),
        cat("cache_hit ", (F.col("n") % 1000).cast("string"),
            " 0.00 Cache hits"),
        cat("MAIN.uptime ", (F.col("n") % 86400).cast("string"),
            " 0.00 Child process uptime"),
        cat("VBE.default(10.0.0.", hs, ",,8080).happy ",
            (F.col("n") % 64).cast("string"), " 0.00 Happy health probes"),
        F.lit("esi_errors notanumber 0.00 ESI parse errors"),   # skipped
        F.lit("MEMPOOL.busyobj 5"),                             # <4 fields
        F.lit("vbe.bad(onepart).fail 5 0.00 desc"),             # D15 skip
        # no dot before the metric: NOT a director line (the r12
        # regex escape) — generic dots→underscores branch instead
        F.lit("VBE.d(a,b,c)Xmetric 7 0.00 unescaped-dot probe"),
    )
    pts = C.parse_varnish_status(_scrape(d, "cache", payload))
    return _out(pts)


# ---------------------------------------------------------------------------
# http_fetch probe results
# ---------------------------------------------------------------------------

@query(
    "collector_http_fetch",
    oracle=f"""
WITH a AS (
  SELECT CAST(user_id AS BIGINT) % 2 AS h, COUNT(*) AS n
  FROM events GROUP BY 1
),
f AS (
  SELECT h, 'http://svc' || h || '.example/a' AS url,
         CAST(n % 5000 AS DOUBLE) / 1000.0 AS time_s,
         200 AS status FROM a
  UNION ALL
  SELECT h, 'http://svc' || h || '.example/b',
         CAST(n % 900 AS DOUBLE) / 1000.0, 400 + n % 100 FROM a
)
SELECT '/http_fetch/time{{datatype=gauge,hostname=probe' || h ||
       ',units=seconds,url="' || url || '"}}' AS series_key,
       {_TS} AS ts, time_s AS dval FROM f
UNION ALL
SELECT '/http_fetch/status{{datatype=gauge,hostname=probe' || h ||
       ',units=seconds,url="' || url || '"}}',
       {_TS}, CAST(status AS DOUBLE) FROM f
""",
)
def collector_http_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 http_fetch probe (client/python/http_fetch_status.py): two
    deterministic fetch results per host — elapsed seconds and status
    code both emitted as gauges carrying the url label (and the
    reference's copy-pasted units=seconds on the status variable) —
    through parse_http_fetch."""
    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    a = ev.groupBy((F.col("user_id") % 2).alias("h")).agg(
        F.count("*").alias("n")
    ).localCheckpoint(eager=False)  # 2 rows, feeds both fetch branches
    hs = F.col("h").cast("string")
    fa = a.select(
        F.concat(F.lit("probe"), hs).alias("hostname"),
        F.lit(NOW).cast("timestamp").alias("ts"),
        F.concat(F.lit("http://svc"), hs, F.lit(".example/a")).alias("url"),
        ((F.col("n") % 5000).cast("double") / 1000.0).alias("time_s"),
        F.lit(200).alias("status"),
    )
    fb = a.select(
        F.concat(F.lit("probe"), hs).alias("hostname"),
        F.lit(NOW).cast("timestamp").alias("ts"),
        F.concat(F.lit("http://svc"), hs, F.lit(".example/b")).alias("url"),
        ((F.col("n") % 900).cast("double") / 1000.0).alias("time_s"),
        (F.lit(400) + F.col("n") % 100).cast("int").alias("status"),
    )
    pts = C.parse_http_fetch(fa.unionByName(fb))
    return _out(pts)


# ---------------------------------------------------------------------------
# /proc/stat
# ---------------------------------------------------------------------------

_STAT_DERIVED = """
a AS (
  SELECT CAST(user_id AS BIGINT) % 2 AS h, COUNT(*) AS n,
         SUM(event_id) % 100000 AS s
  FROM events GROUP BY 1
),
d AS (
  SELECT h, n, s,
         n % 1000 AS cu, s % 500 AS cn, n % 700 AS cs, (n * 3) % 9000 AS ci,
         n % 50 AS cio, n % 20 AS cq, n % 30 AS csi,
         1706000000 + (n % 86400) AS btime
  FROM a
)
"""

_CPU_SQL_METRICS = [
    ("user", "cu"), ("nice", "cn"), ("system", "cs"), ("idle", "ci"),
    ("iowait", "cio"), ("irq", "cq"), ("softirq", "csi"),
]


def _cpu_rows_sql(cpu_label: str, shift: str) -> str:
    rows = []
    for metric, col in _CPU_SQL_METRICS:
        rows.append(
            f"SELECT '/system/stats/cpu_stats/{metric}{{cpu={cpu_label},"
            f"datatype=counter,hostname=node' || h || ',units=seconds}}'"
            f" AS series_key, {_TS} AS ts,"
            f" CAST({col}{shift} AS DOUBLE) / 100.0 AS dval FROM d"
        )
    return "\nUNION ALL\n".join(rows)


@query(
    "collector_proc_stat",
    oracle=f"""
WITH {_STAT_DERIVED}
{_cpu_rows_sql('total', '')}
UNION ALL
{_cpu_rows_sql('0', ' + 1')}
UNION ALL
SELECT '/system/stats/cpu_stats/interrupts{{datatype=counter,hostname=node'
       || h || ',interrupt=total}}', {_TS}, CAST(n % 100000 AS DOUBLE) FROM d
UNION ALL
SELECT '/system/stats/cpu_stats/context_switches{{datatype=counter,hostname=node'
       || h || '}}', {_TS}, CAST(s AS DOUBLE) FROM d
UNION ALL
SELECT '/system/stats/uptime{{datatype=gauge,hostname=node' || h || '}}',
       {_TS}, epoch({_TS}) - CAST(btime AS DOUBLE) FROM d
UNION ALL
SELECT '/system/stats/processes_started{{datatype=counter,hostname=node'
       || h || '}}', {_TS}, CAST(n % 5000 AS DOUBLE) FROM d
UNION ALL
SELECT '/system/stats/processes_running{{datatype=gauge,hostname=node'
       || h || '}}', {_TS}, CAST(n % 32 AS DOUBLE) FROM d
UNION ALL
SELECT '/system/stats/processes_blocked{{datatype=gauge,hostname=node'
       || h || '}}', {_TS}, CAST(n % 7 AS DOUBLE) FROM d
UNION ALL
SELECT '/system/stats/softirq{{datatype=counter,hostname=node' || h ||
       ',irq=total}}', {_TS}, CAST(n % 90000 AS DOUBLE) FROM d
UNION ALL
SELECT '/system/stats/softirq{{datatype=counter,hostname=node' || h ||
       ',irq=' || i.i || '}}', {_TS},
       CAST(CASE i.i WHEN 0 THEN n % 11 ELSE n % 13 END AS DOUBLE)
FROM d CROSS JOIN (SELECT UNNEST([0, 1]) AS i) i
""",
)
def collector_proc_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 system collector, /proc/stat: per-host payloads with a
    7-field ``cpu`` line, a 10-field ``cpu0`` line (the maxsplit path —
    trailing fields dropped), intr/ctxt/btime/processes/procs_* and a
    softirq line with per-index counters, through parse_proc_stat at
    HZ=100 (system_status.py:41-91)."""
    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    d = ev.groupBy((F.col("user_id") % 2).alias("h")).agg(
        F.count("*").alias("n"),
        (F.sum("event_id") % 100000).alias("s"),
    ).select(
        "h", "n", "s",
        (F.col("n") % 1000).alias("cu"),
        (F.col("s") % 500).alias("cn"),
        (F.col("n") % 700).alias("cs"),
        ((F.col("n") * 3) % 9000).alias("ci"),
        (F.col("n") % 50).alias("cio"),
        (F.col("n") % 20).alias("cq"),
        (F.col("n") % 30).alias("csi"),
        (F.lit(1706000000) + (F.col("n") % 86400)).alias("btime"),
    )

    def cat(*parts):
        return F.concat(*[
            p if isinstance(p, Column) else F.lit(p) for p in parts
        ])

    def num(c):
        return F.col(c).cast("string")

    sp = F.lit(" ")
    cpu_total = cat(
        "cpu  ", num("cu"), sp, num("cn"), sp, num("cs"), sp, num("ci"),
        sp, num("cio"), sp, num("cq"), sp, num("csi"),
    )
    cpu0 = cat(
        "cpu0 ", (F.col("cu") + 1).cast("string"), sp,
        (F.col("cn") + 1).cast("string"), sp,
        (F.col("cs") + 1).cast("string"), sp,
        (F.col("ci") + 1).cast("string"), sp,
        (F.col("cio") + 1).cast("string"), sp,
        (F.col("cq") + 1).cast("string"), sp,
        (F.col("csi") + 1).cast("string"), " 7 8 9",
    )
    payload = F.concat_ws(
        "\n",
        cpu_total,
        cpu0,
        cat("intr ", (F.col("n") % 100000).cast("string"), " 1 2 3"),
        cat("ctxt ", num("s")),
        cat("btime ", num("btime")),
        cat("processes ", (F.col("n") % 5000).cast("string")),
        cat("procs_running ", (F.col("n") % 32).cast("string")),
        cat("procs_blocked ", (F.col("n") % 7).cast("string")),
        cat(
            "softirq ", (F.col("n") % 90000).cast("string"), sp,
            (F.col("n") % 11).cast("string"), sp,
            (F.col("n") % 13).cast("string"),
        ),
    )
    pts = C.parse_proc_stat(_scrape(d, "node", payload), hz=100.0)
    return _out(pts)


# ---------------------------------------------------------------------------
# meminfo + df + loadavg + ntpq (the rest of system_status.py)
# ---------------------------------------------------------------------------

_SYS_DERIVED = """
a AS (
  SELECT CAST(user_id AS BIGINT) % 2 AS h, COUNT(*) AS n
  FROM events GROUP BY 1
),
d AS (
  SELECT h, n, n % 90 + 10 AS ldfrac,
         n % 100000 AS mt, n % 50000 AS mf, n % 300 AS sc, n % 64 AS hp,
         n % 4000 AS aa,
         n % 900000 + 1 AS sz, n % 400000 AS us, n % 200000 AS av,
         n % 65536 + 1 AS i1, n % 30000 AS i2, n % 20000 AS i3,
         n % 3000 AS nd, n % 2000 AS no, n % 500 AS nj
  FROM a
)
"""


def _fs_rows_sql(metric: str, col: str, scale: str) -> str:
    return (
        f"SELECT '/system/filesystem/{metric}{{datatype=gauge,device=/dev/sda1,"
        f"hostname=fs' || h || ',mountpoint=/,units=bytes}}' AS series_key,"
        f" {_TS} AS ts, CAST({col} AS DOUBLE){scale} AS dval FROM d"
    )


def _inode_rows_sql(metric: str, col: str) -> str:
    return (
        f"SELECT '/system/filesystem/{metric}{{datatype=gauge,device=/dev/sda1,"
        f"hostname=fs' || h || ',mountpoint=/,units=inodes}}',"
        f" {_TS}, CAST({col} AS DOUBLE) FROM d"
    )


@query(
    "collector_system_status",
    oracle=f"""
WITH {_SYS_DERIVED}
SELECT '/system/memory/memtotal{{datatype=gauge,hostname=fs' || h || '}}'
       AS series_key, {_TS} AS ts, CAST(mt AS DOUBLE) * 1024.0 AS dval FROM d
UNION ALL
SELECT '/system/memory/memfree{{datatype=gauge,hostname=fs' || h || '}}',
       {_TS}, CAST(mf AS DOUBLE) * 1024.0 FROM d
UNION ALL
SELECT '/system/memory/swapcached{{datatype=gauge,hostname=fs' || h || '}}',
       {_TS}, CAST(sc AS DOUBLE) * 1024.0 * 1024.0 FROM d
UNION ALL
SELECT '/system/memory/hugepages_total{{datatype=gauge,hostname=fs' || h ||
       '}}', {_TS}, CAST(hp AS DOUBLE) FROM d
UNION ALL
SELECT '/system/memory/active_anon_{{datatype=gauge,hostname=fs' || h ||
       '}}', {_TS}, CAST(aa AS DOUBLE) * 1024.0 FROM d
UNION ALL
{_fs_rows_sql('size', 'sz', ' * 1024.0')}
UNION ALL
{_fs_rows_sql('used', 'us', ' * 1024.0')}
UNION ALL
{_fs_rows_sql('available', 'av', ' * 1024.0')}
UNION ALL
{_inode_rows_sql('inodes_total', 'i1')}
UNION ALL
{_inode_rows_sql('inodes_used', 'i2')}
UNION ALL
{_inode_rows_sql('inodes_available', 'i3')}
UNION ALL
SELECT '/system/load_average{{datatype=gauge,hostname=fs' || h || '}}',
       {_TS}, CAST('0.' || ldfrac AS DOUBLE) FROM d
UNION ALL
SELECT '/ntp/' || m.m || '{{datatype=gauge,hostname=fs' || h ||
       ',remote=10.0.0.' || h || ',units=seconds}}', {_TS},
       CAST(CASE m.m WHEN 'delay' THEN nd WHEN 'offset' THEN no
            ELSE nj END AS DOUBLE) / 1000.0
FROM d CROSS JOIN (SELECT UNNEST(['delay', 'offset', 'jitter']) AS m) m
""",
)
def collector_system_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 system collector, the non-/proc/stat formats in one pass:
    meminfo (kB/MB/bare scaling, paren → underscore keys), df blocks
    (×1024, header self-skips) and inodes (zero-inode filesystems
    skipped), loadavg first-field, and the ntpq sync-peer ms→s
    conversion — each payload through its real parser, unioned
    (system_status.py:94-229)."""
    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    n = F.col("n")
    d = ev.groupBy((F.col("user_id") % 2).alias("h")).agg(
        F.count("*").alias("n")
    ).select(
        "h", "n",
        (n % 90 + 10).alias("ldfrac"),
        (n % 100000).alias("mt"), (n % 50000).alias("mf"),
        (n % 300).alias("sc"), (n % 64).alias("hp"), (n % 4000).alias("aa"),
        (n % 900000 + 1).alias("sz"), (n % 400000).alias("us"),
        (n % 200000).alias("av"),
        (n % 65536 + 1).alias("i1"), (n % 30000).alias("i2"),
        (n % 20000).alias("i3"),
        (n % 3000).alias("nd"), (n % 2000).alias("no"), (n % 500).alias("nj"),
    ).localCheckpoint(eager=False)  # 2 rows; feeds FIVE union branches
    # (r14, guide §7.2): un-checkpointed, every parser branch re-ran the
    # events scan + aggregate.

    def cat(*parts):
        return F.concat(*[
            p if isinstance(p, Column) else F.lit(p) for p in parts
        ])

    def num(c):
        return F.col(c).cast("string")

    meminfo = F.concat_ws(
        "\n",
        cat("MemTotal:        ", num("mt"), " kB"),
        cat("MemFree:         ", num("mf"), " kB"),
        cat("SwapCached:      ", num("sc"), " MB"),
        cat("HugePages_Total: ", num("hp")),
        cat("Active(anon):    ", num("aa"), " kB"),
        F.lit("garbage line without a separator"),
    )
    df_blocks = F.concat_ws(
        "\n",
        F.lit("Filesystem     1024-blocks     Used Available Capacity Mounted on"),
        cat("/dev/sda1 ", num("sz"), " ", num("us"), " ", num("av"), " 50% /"),
    )
    df_inodes = F.concat_ws(
        "\n",
        F.lit("Filesystem     Inodes   IUsed   IFree Capacity Mounted on"),
        cat("/dev/sda1 ", num("i1"), " ", num("i2"), " ", num("i3"), " 2% /"),
        F.lit("devfs 0 0 0 - /dev"),
    )
    loadavg = cat("0.", num("ldfrac"), " 0.20 0.10 1/123 456")
    ntpq = F.concat_ws(
        "\n",
        F.lit("     remote           refid      st t when poll reach   delay"
              "   offset  jitter"),
        F.lit("=" * 78),
        cat("+10.1.1.1 .GPS. 1 u 33 64 377 1 2 3"),
        cat(
            "*10.0.0.", F.col("h").cast("string"), " .PPS. 1 u 12 64 377 ",
            num("nd"), " ", num("no"), " ", num("nj"),
        ),
    )
    parts = [
        C.parse_meminfo(_scrape(d, "fs", meminfo)),
        C.parse_df_blocks(_scrape(d, "fs", df_blocks)),
        C.parse_df_inodes(_scrape(d, "fs", df_inodes)),
        C.parse_loadavg(_scrape(d, "fs", loadavg)),
        C.parse_ntpq(_scrape(d, "fs", ntpq)),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return _out(out)


# ---------------------------------------------------------------------------
# SNMP host-stats poller (tools/snmp_hoststats.py)
# ---------------------------------------------------------------------------

_IFE = "iso.org.dod.internet.mgmt.mib-2.interfaces.ifTable.ifEntry"
_IFX = "iso.org.dod.internet.mgmt.mib-2.ifMIB.ifMIBObjects.ifXTable.ifXEntry"
_HRS = ("iso.org.dod.internet.mgmt.mib-2.host.hrStorage"
        ".hrStorageTable.hrStorageEntry")
_SYS = "iso.org.dod.internet.mgmt.mib-2.host.hrSystem"


@query(
    "collector_snmp_hoststats",
    oracle=f"""
WITH a AS (
  SELECT CAST(user_id AS BIGINT) % 3 AS h, COUNT(*) AS n
  FROM events GROUP BY 1
)
SELECT '/network/interface/stats/ifDescr{{datatype=string,hostname=sw' || h ||
       ',interface=eth0,srchost=mon1}}' AS series_key, {_TS} AS ts,
       CAST(NULL AS DOUBLE) AS dval, 'eth0' AS sval FROM a
UNION ALL
SELECT '/network/interface/stats/ifInOctets{{datatype=counter,hostname=sw' || h ||
       ',interface=eth0,srchost=mon1}}', {_TS},
       CAST(n * 1000 + h AS DOUBLE), CAST(NULL AS VARCHAR) FROM a
UNION ALL
SELECT '/network/interface/stats/ifSpeed{{datatype=gauge,hostname=sw' || h ||
       ',interface=eth0,srchost=mon1}}', {_TS},
       CAST((n % 10 + 1) * 100000000 AS DOUBLE), NULL FROM a
UNION ALL
SELECT '/network/interface/stats/ifPhysAddress{{datatype=string,hostname=sw' || h ||
       ',interface=eth0,srchost=mon1}}', {_TS},
       NULL, '41:42:43:31:32:3' || h FROM a
UNION ALL
SELECT '/network/interface/stats/ifDescr{{datatype=string,hostname=sw' || h ||
       ',interface=eth1,srchost=mon1}}', {_TS}, NULL, 'eth1' FROM a
UNION ALL
SELECT '/network/interface/stats/ifInOctets{{datatype=counter,hostname=sw' || h ||
       ',interface=eth1,srchost=mon1}}', {_TS},
       CAST(n % 997 AS DOUBLE), NULL FROM a
UNION ALL
SELECT '/network/interface/stats/ifOutQLen{{datatype=integer,hostname=sw' || h ||
       ',interface=eth1,srchost=mon1,units=ticks}}', {_TS},
       CAST(n % 50 AS DOUBLE), NULL FROM a
UNION ALL
SELECT '/system/filesystem/' || m.m || '{{device=/,hostname=sw' || h ||
       ',srchost=mon1}}', {_TS},
       CAST(CASE m.m WHEN 'size' THEN (n % 1000 + 1) * 4096
            WHEN 'used' THEN (n % 97) * 4096
            ELSE ((n % 1000 + 1) - (n % 97)) * 4096 END AS DOUBLE), NULL
FROM a CROSS JOIN (SELECT UNNEST(['size', 'used', 'available']) AS m) m
UNION ALL
SELECT '/system/ram/' || m.m || '{{datatype=gauge,hostname=sw' || h ||
       ',space=Physical memory,srchost=mon1}}', {_TS},
       CAST(CASE m.m WHEN 'size' THEN (n % 2048 + 2048) * 1024
            WHEN 'used' THEN (n % 1024) * 1024
            ELSE ((n % 2048 + 2048) - (n % 1024)) * 1024 END AS DOUBLE), NULL
FROM a CROSS JOIN (SELECT UNNEST(['size', 'used', 'available']) AS m) m
UNION ALL
SELECT '/system/uptime{{datatype=gauge,hostname=sw' || h || ',srchost=mon1}}',
       {_TS}, CAST(n AS DOUBLE), NULL FROM a
UNION ALL
SELECT '/system/boot/kernel-commandline{{datatype=string,hostname=sw' || h ||
       ',srchost=mon1}}', {_TS}, NULL, 'root=/dev/sda' || h FROM a
UNION ALL
SELECT '/system/num_users/{{datatype=gauge,hostname=sw' || h ||
       ',srchost=mon1}}', {_TS}, CAST(h + 1 AS DOUBLE), NULL FROM a
UNION ALL
SELECT '/system/num_processes/{{datatype=gauge,hostname=sw' || h ||
       ',srchost=mon1}}', {_TS}, CAST(n % 500 AS DOUBLE), NULL FROM a
""",
)
def collector_snmp_hoststats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 SNMP poller (tools/snmp_hoststats.py): deterministic walk
    bindings — two interfaces (one with a Counter64 HC override, one
    without), a fixed disk, a Physical-memory storage row, the hrSystem
    scalars, and a planted unmapped-type binding — are synthesized per
    host from events aggregates and pushed through the REAL
    table→variable parser (sources/snmp.py). The oracle recomputes
    every surviving point directly: the HC override value/type swap,
    MAC formatting, TimeTicks units label, block-size multiplication,
    uptime tick truncation, and the trailing-slash variable names all
    sit under the value-hash gate."""
    from open_instrument_spark.sources import snmp as SN

    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    d = ev.groupBy((F.col("user_id") % 3).alias("h")).agg(
        F.count("*").alias("n")
    )
    n, h = F.col("n"), F.col("h")
    hs = h.cast("string")

    def b(oid: str, val, vtype: str) -> Column:
        v = val if isinstance(val, Column) else F.lit(val)
        return F.struct(
            F.lit(oid).alias("oid"),
            v.cast("string").alias("value"),
            F.lit(vtype).alias("vtype"),
        )

    walk = d.select(
        F.concat(F.lit("sw"), hs).alias("hostname"),
        F.lit(NOW).cast("timestamp").alias("ts"),
        F.explode(
            F.array(
                b(f"{_IFE}.ifIndex.1", 1, "Integer"),
                b(f"{_IFE}.ifDescr.1", "eth0", "OctetString"),
                b(f"{_IFE}.ifInOctets.1", n % 100000, "Counter32"),
                b(f"{_IFE}.ifSpeed.1", (n % 10 + 1) * 100000000, "Gauge32"),
                b(f"{_IFE}.ifPhysAddress.1",
                  F.concat(F.lit("ABC12"), hs), "OctetString"),
                # unmapped SNMP type → SetVarType None → dropped
                b(f"{_IFE}.ifMtu.1", 1500, "Opaque"),
                b(f"{_IFX}.ifName.1", "eth0", "OctetString"),
                b(f"{_IFX}.ifHCInOctets.1", n * 1000 + h, "Counter64"),
                b(f"{_IFE}.ifIndex.2", 2, "Integer"),
                b(f"{_IFE}.ifDescr.2", "eth1", "OctetString"),
                b(f"{_IFE}.ifInOctets.2", n % 997, "Counter32"),
                b(f"{_IFE}.ifOutQLen.2", n % 50, "TimeTicks"),
                b(f"{_HRS}.hrStorageType.1", "1.3.6.1.2.1.25.2.1.4",
                  "OctetString"),
                b(f"{_HRS}.hrStorageDescr.1", "/", "OctetString"),
                b(f"{_HRS}.hrStorageAllocationUnits.1", 4096, "Integer"),
                b(f"{_HRS}.hrStorageSize.1", n % 1000 + 1, "Integer"),
                b(f"{_HRS}.hrStorageUsed.1", n % 97, "Integer"),
                b(f"{_HRS}.hrStorageType.2", "1.3.6.1.2.1.25.2.1.2",
                  "OctetString"),
                b(f"{_HRS}.hrStorageDescr.2", "Physical memory",
                  "OctetString"),
                b(f"{_HRS}.hrStorageAllocationUnits.2", 1024, "Integer"),
                b(f"{_HRS}.hrStorageSize.2", n % 2048 + 2048, "Integer"),
                b(f"{_HRS}.hrStorageUsed.2", n % 1024, "Integer"),
                b(f"{_SYS}.hrSystemUptime.0", n * 100 + h, "TimeTicks"),
                b(f"{_SYS}.hrSystemInitialLoadParameters.0",
                  F.concat(F.lit("root=/dev/sda"), hs), "OctetString"),
                b(f"{_SYS}.hrSystemNumUsers.0", h + 1, "Gauge32"),
                b(f"{_SYS}.hrSystemProcesses.0", n % 500, "Gauge32"),
            )
        ).alias("s"),
    ).select("hostname", "ts", "s.oid", "s.value", "s.vtype")

    pts = SN.parse_snmp_hoststats(walk, srchost="mon1")
    return pts.select(
        series_key().alias("series_key"), "ts", "dval", "sval"
    )


# ---------------------------------------------------------------------------
# cisco_config.py — config snapshot as a STRING blob series
# ---------------------------------------------------------------------------

@query(
    "collector_cisco_config",
    oracle="""
WITH a AS (
  SELECT CAST(user_id AS BIGINT) % 3 AS h, COUNT(*) AS n
  FROM events GROUP BY 1
),
st AS (
  SELECT a.h,
         string_agg('interface GigabitEthernet0/' || i ||
                    ' ip address 10.' || a.h || '.' || i ||
                    '.1 255.255.255.0 no shutdown!', '' ORDER BY i) AS stanzas
  FROM a CROSS JOIN range(1, 41) t(i) GROUP BY a.h
),
cfg AS (
  SELECT a.h, d.d,
         'hostname router' || a.h ||
         'version 15.' || (CASE WHEN d.d < 3 THEN 0 ELSE 1 END) ||
         ' build ' || a.n || st.stanzas || 'end' AS sval
  FROM a JOIN st USING (h) CROSS JOIN range(0, 6) d(d)
),
pts AS (
  SELECT '/network/device/configuration{device_type=cisco,hostname=router'
         || h || '}' AS series_key,
         TIMESTAMP '2024-01-01' + d * INTERVAL 1 DAY AS ts, sval
  FROM cfg
),
chg AS (
  SELECT series_key, ts, sval,
         CASE WHEN sval IS NOT DISTINCT FROM lag(sval) OVER w
              THEN 0 ELSE 1 END AS c
  FROM pts WINDOW w AS (PARTITION BY series_key ORDER BY ts)
),
rid AS (
  SELECT *, sum(c) OVER (PARTITION BY series_key ORDER BY ts) AS run FROM chg
)
SELECT series_key, min(ts) AS ts, max(ts) AS end_ts,
       CAST(count(*) AS BIGINT) AS run_len,
       CAST(length(max(sval)) AS BIGINT) AS cfg_len,
       md5(max(sval)) AS cfg_md5
FROM rid GROUP BY series_key, run
""",
)
def collector_cisco_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last reference collector DATA SHAPE (judge r11 #4): a
    multi-KB device config lands as ONE string sample
    (cisco_config.py:94-103 — `/network/device/configuration
    {device_type=cisco,hostname=h}` with the whole blob in
    string_value), is downsampled by daily LATEST (the config.txt:37-47
    string-retention mutation) and RLE'd across days (W3 on sval at
    blob size — consecutive identical snapshots collapse into one
    (ts, end_ts) run).

    Synth: per router h, six days × two snapshots/day of a ~3 KB
    40-interface running-config whose version line flips at day 3 —
    telnet capture junk (prompt echoes, Building configuration...,
    trailing #exit) wrapped around the body, parsed by the REAL
    parse_cisco_config (trim + separator-less join under the gate),
    then LATEST("1d") keeps each day's 20:00 snapshot and rle_encode
    emits exactly two runs per router. Blob bytes are pinned end-to-end
    by md5 + length; run boundaries by (ts, end_ts, run_len)."""
    import datetime as _dt

    from open_instrument_spark.operators import mutate
    from open_instrument_spark.operators.rle import rle_encode

    prepare(spark)
    ev = load_tables(spark, sf_dir).table("events")
    a = ev.groupBy((F.col("user_id") % 3).alias("h")).agg(
        F.count("*").alias("n"))
    hs = F.col("h").cast("string")
    snaps = a.select(
        "h", "n", F.explode(F.sequence(F.lit(0), F.lit(5))).alias("d")
    ).select("*", F.explode(F.array(F.lit(8), F.lit(20))).alias("hh"))
    p = F.when(F.col("d") < 3, F.lit("0")).otherwise(F.lit("1"))
    stanzas = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda i: F.concat(
                F.lit("interface GigabitEthernet0/"), i.cast("string"),
                F.lit("\r\n ip address 10."), hs, F.lit("."),
                i.cast("string"),
                F.lit(".1 255.255.255.0\r\n no shutdown\r\n!"),
            ),
        ),
        "\r\n",
    )
    body = F.concat(
        F.lit("hostname router"), hs,
        F.lit("\r\nversion 15."), p, F.lit(" build "),
        F.col("n").cast("string"), F.lit("\r\n"),
        stanzas, F.lit("\r\nend"),
    )
    raw = F.concat(
        F.lit("\r\nrouter"), hs, F.lit("#term length 0\r\nrouter"), hs,
        F.lit("#show running-config\r\nBuilding configuration...\r\n\r\n"),
        body,
        F.lit("\r\n\r\nrouter"), hs, F.lit("#exit\r\n "),
    )
    base_us = int(_dt.datetime(2024, 1, 1,
                               tzinfo=_dt.timezone.utc).timestamp() * 1e6)
    off_us = ((F.col("d") * 86400 + F.col("hh") * 3600).cast("long")
              * F.lit(1_000_000).cast("long"))
    caps = snaps.select(
        F.concat(F.lit("router"), hs).alias("hostname"),
        F.timestamp_micros(F.lit(base_us).cast("long") + off_us).alias("ts"),
        raw.alias("raw"),
    )
    daily = mutate.latest(C.parse_cisco_config(caps), "1d")
    runs = rle_encode(daily)
    return runs.select(
        "series_key", "ts", "end_ts",
        F.col("run_len").cast("long").alias("run_len"),
        F.length("sval").cast("long").alias("cfg_len"),
        F.md5(F.col("sval").cast("binary")).alias("cfg_md5"),
    )
