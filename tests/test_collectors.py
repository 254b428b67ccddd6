"""S13 collector parsers vs hand-computed expectations on verbatim
payload fixtures (client/python/{mysql,apache,system}_status.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from open_instrument_spark.sources import collectors as C

TS = dt.datetime(2024, 1, 31, 0, 0, 0)


def scrape(spark, payload, hostname="h1", ts=TS):
    return spark.createDataFrame(
        [(hostname, ts, payload)], "hostname string, ts timestamp, payload string"
    )


def rows(df):
    out = []
    for r in df.collect():
        out.append((r["name"], dict(r["labels"] or {}), r["dval"], r["sval"]))
    return sorted(out, key=lambda t: (t[0], sorted(t[1].items())))


MYSQL = """Variable_name\tValue
Aborted_clients\t10
Threads_running\t3
Have_ssl\tON
Have_query_cache\tOFF
Version_comment\tMySQL Community Server
Uptime\t86400
Slave_running\tNO
"""


def test_mysql_status(spark):
    got = rows(C.parse_mysql_status(scrape(spark, MYSQL), port=F.lit("3306")))
    exp = sorted(
        [
            ("/database/mysql/status/aborted_clients",
             {"hostname": "h1", "port": "3306"}, 10.0, None),
            ("/database/mysql/status/threads_running",
             {"hostname": "h1", "port": "3306"}, 3.0, None),
            ("/database/mysql/status/have_ssl",
             {"hostname": "h1", "port": "3306"}, 1.0, None),
            ("/database/mysql/status/have_query_cache",
             {"hostname": "h1", "port": "3306"}, 0.0, None),
            ("/database/mysql/status/uptime",
             {"hostname": "h1", "port": "3306"}, 86400.0, None),
        ],
        key=lambda t: (t[0], sorted(t[1].items())),
    )
    # header ("Value" not float), 3-token line, and NO/non-float values
    # are all skipped, exactly the reference's except-continue paths
    assert got == exp


def test_mysql_status_no_port_label(spark):
    got = rows(C.parse_mysql_status(scrape(spark, "Uptime\t5\n")))
    assert got == [("/database/mysql/status/uptime", {"hostname": "h1"}, 5.0, None)]


APACHE = """Total Accesses: 1234
Total kBytes: 7
CPULoad: .0265
Uptime: 1234567
ReqPerSec: .0066
BytesPerSec: 6.17
BytesPerReq: 934
BusyServers: 2
IdleServers: 5
Scoreboard: __WWK._SRX
"""


def test_apache_status_metrics_and_scoreboard(spark):
    got = rows(C.parse_apache_status(scrape(spark, APACHE)))
    h = {"hostname": "h1"}
    slots = {
        "waiting": 3, "starting": 1, "reading": 1, "writing": 2,
        "keepalive": 1, "dns": 0, "closing": 0, "logging": 0,
        "lameduck": 0, "idle_cleanup": 0, "open": 1,
    }  # X is not a worker type and is ignored
    exp = [
        ("/webserver/apache/hits", h, 1234.0, None),
        ("/webserver/apache/bytes", {**h, "units": "bytes"}, 7168.0, None),
        ("/webserver/apache/cpu_load", h, 0.0265, None),
        ("/webserver/apache/uptime", h, 1234567.0, None),
        ("/webserver/apache/req_per_sec", h, 0.0066, None),
        ("/webserver/apache/bytes_per_sec", h, 6.17, None),
        ("/webserver/apache/bytes_per_req", h, 934.0, None),
        ("/webserver/apache/busy_workers", h, 2.0, None),
        ("/webserver/apache/idle_workers", h, 5.0, None),
    ] + [
        ("/webserver/apache/worker_slots/" + k, h, float(v), None)
        for k, v in slots.items()
    ]
    assert got == sorted(exp, key=lambda t: (t[0], sorted(t[1].items())))


def test_apache_status_without_scoreboard_emits_zero_slots(spark):
    got = rows(C.parse_apache_status(scrape(spark, "Total Accesses: 9\n")))
    slot_rows = [r for r in got if "/worker_slots/" in r[0]]
    assert len(slot_rows) == 11
    assert all(r[2] == 0.0 for r in slot_rows)


def test_apache_status_string_sample_fallback(spark):
    # AddVar keeps non-float values as string samples
    got = rows(C.parse_apache_status(scrape(spark, "CPULoad: unavailable\n")))
    m = [r for r in got if r[0] == "/webserver/apache/cpu_load"]
    assert m == [("/webserver/apache/cpu_load", {"hostname": "h1"}, None,
                  "unavailable")]


PROC_STAT = """cpu  10 20 30 40 50 60 70 80 0 0
cpu0 1 2 3 4 5 6 7 8 0 0
intr 999 1 2 3
ctxt 555
btime 1706658000
processes 777
procs_running 4
procs_blocked 1
softirq 300 100 200
"""


def test_proc_stat(spark):
    got = rows(C.parse_proc_stat(scrape(spark, PROC_STAT), hz=100.0))
    cnt = {"datatype": "counter", "hostname": "h1", "units": "seconds"}
    by_name = {}
    for name, lbl, dval, _ in got:
        by_name.setdefault((name, tuple(sorted(lbl.items()))), dval)
    assert by_name[(
        "/system/stats/cpu_stats/user", tuple(sorted({**cnt, "cpu": "total"}.items()))
    )] == 10 / 100.0
    assert by_name[(
        "/system/stats/cpu_stats/softirq", tuple(sorted({**cnt, "cpu": "0"}.items()))
    )] == 7 / 100.0
    assert by_name[(
        "/system/stats/cpu_stats/interrupts",
        tuple(sorted({"datatype": "counter", "hostname": "h1",
                      "interrupt": "total"}.items())),
    )] == 999.0
    assert by_name[(
        "/system/stats/cpu_stats/context_switches",
        tuple(sorted({"datatype": "counter", "hostname": "h1"}.items())),
    )] == 555.0
    # uptime = scrape epoch - btime; TS is 2024-01-31T00:00:00 UTC
    utc_ts = TS.replace(tzinfo=dt.timezone.utc).timestamp()
    assert by_name[(
        "/system/stats/uptime",
        tuple(sorted({"datatype": "gauge", "hostname": "h1"}.items())),
    )] == utc_ts - 1706658000
    assert by_name[(
        "/system/stats/processes_started",
        tuple(sorted({"datatype": "counter", "hostname": "h1"}.items())),
    )] == 777.0
    # softirq: total + one counter per remaining field, zero-indexed
    sirq = sorted(
        (lbl["irq"], dval)
        for name, lbl, dval, _ in got
        if name == "/system/stats/softirq"
    )
    assert sirq == [("0", 100.0), ("1", 200.0), ("total", 300.0)]


MEMINFO = """MemTotal:        16384 kB
MemFree:          8192 kB
SwapCached:          2 MB
HugePages_Total:     7
Active(anon):      512 kB
VmallocChunk:   34359738367 kB
garbage line without colon
"""


def test_meminfo(spark):
    got = {r[0]: r[2] for r in rows(C.parse_meminfo(scrape(spark, MEMINFO)))}
    assert got == {
        "/system/memory/memtotal": 16384 * 1024.0,
        "/system/memory/memfree": 8192 * 1024.0,
        "/system/memory/swapcached": 2 * 1024.0 * 1024.0,
        "/system/memory/hugepages_total": 7.0,
        "/system/memory/active_anon_": 512 * 1024.0,
        "/system/memory/vmallocchunk": 34359738367 * 1024.0,
    }


DF_BLOCKS = """Filesystem     1024-blocks     Used Available Capacity Mounted on
/dev/sda1         102400    51200     51200      50% /
tmpfs               1024      512       512      50% /mnt/my disk
"""


def test_df_blocks(spark):
    got = rows(C.parse_df_blocks(scrape(spark, DF_BLOCKS)))
    root = [r for r in got if r[1].get("mountpoint") == "/"]
    assert {r[0]: r[2] for r in root} == {
        "/system/filesystem/size": 102400 * 1024.0,
        "/system/filesystem/used": 51200 * 1024.0,
        "/system/filesystem/available": 51200 * 1024.0,
    }
    spaced = [r for r in got if r[1].get("mountpoint") == "/mnt/my disk"]
    assert len(spaced) == 3 and spaced[0][1]["device"] == "tmpfs"
    assert all(r[1]["units"] == "bytes" for r in got)


DF_INODES = """Filesystem     Inodes   IUsed   IFree Capacity Mounted on
/dev/sda1       65536    1000   64536       2% /
devfs               0       0       0        - /dev
"""


def test_df_inodes_skips_zero(spark):
    got = rows(C.parse_df_inodes(scrape(spark, DF_INODES)))
    assert {r[0]: r[2] for r in got} == {
        "/system/filesystem/inodes_total": 65536.0,
        "/system/filesystem/inodes_used": 1000.0,
        "/system/filesystem/inodes_available": 64536.0,
    }
    assert all(r[1]["units"] == "inodes" for r in got)


DISKSTATS = """   8       0 sda 100 5 2000 300 50 7 1000 400 0 600 700
   8      16 sdb 0 0 0 0 0 0 0 0 0 0 0
 253       0 dm-0 10 0 80 90 20 0 160 170 0 110 120 extra fields here
"""


def test_diskstats(spark):
    got = rows(C.parse_diskstats(scrape(spark, DISKSTATS)))
    # sdb skipped (0 reads AND 0 writes); dm-0 skipped (not 14 fields)
    assert {r[1]["device"] for r in got} == {"sda"}
    assert {r[0]: r[2] for r in got} == {
        "/system/disk_stats/reads": 100.0,
        "/system/disk_stats/reads_merged": 5.0,
        "/system/disk_stats/sectors_read": 2000.0,
        "/system/disk_stats/ms_reading": 300.0,
        "/system/disk_stats/writes": 50.0,
        "/system/disk_stats/writes_merged": 7.0,
        "/system/disk_stats/sectors_written": 1000.0,
        "/system/disk_stats/ms_writing": 400.0,
    }


NET_DEV = """Inter-|   Receive                                                |  Transmit
 face |bytes    packets errs drop fifo frame compressed multicast|bytes    packets errs drop fifo colls carrier compressed
    lo: 100 2 0 0 1 3 4 5 600 7 8 9 10 11 12 13
  eth0: 1000 20 1 2 30 40 50 60 7000 80 90 100 110 120 130 140
"""


def test_net_dev(spark):
    got = rows(C.parse_net_dev(scrape(spark, NET_DEV)))
    eth = {r[0]: (r[2], r[1]["datatype"]) for r in got
           if r[1]["interface"] == "eth0"}
    assert eth["/network/interface/stats/read_bytes"] == (1000.0, "counter")
    assert eth["/network/interface/stats/read_fifo"] == (30.0, "gauge")
    assert eth["/network/interface/stats/write_fifo"] == (110.0, "gauge")
    assert eth["/network/interface/stats/write_collisions"] == (120.0, "counter")
    assert eth["/network/interface/stats/write_carrier"] == (130.0, "counter")
    assert eth["/network/interface/stats/write_compressed"] == (140.0, "counter")
    assert len([r for r in got if r[1]["interface"] == "lo"]) == 16


def test_loadavg_and_entropy_and_vmstat(spark):
    got = rows(C.parse_loadavg(scrape(spark, "0.52 0.40 0.30 1/234 5678\n")))
    assert got == [("/system/load_average",
                    {"datatype": "gauge", "hostname": "h1"}, 0.52, None)]
    got = rows(C.parse_entropy(scrape(spark, "3456\n")))
    assert got == [("/system/random/entropy_available",
                    {"datatype": "gauge", "hostname": "h1"}, 3456.0, None)]
    got = rows(C.parse_vmstat(scrape(spark, "pgfault 123\npgmajfault 4\n")))
    assert {r[0]: r[2] for r in got} == {
        "/system/vmstat/pgfault": 123.0,
        "/system/vmstat/pgmajfault": 4.0,
    }
    assert all(r[1] == {"hostname": "h1"} for r in got)


NTPQ = """     remote           refid      st t when poll reach   delay   offset  jitter
==============================================================================
+10.1.1.1        .GPS.            1 u   33   64  377    1.234   -0.567   0.089
*10.0.0.1        .PPS.            1 u   12   64  377    2000    500      125
"""


def test_ntpq_only_sync_peer(spark):
    got = rows(C.parse_ntpq(scrape(spark, NTPQ)))
    lbl = {"datatype": "gauge", "hostname": "h1", "remote": "10.0.0.1",
           "units": "seconds"}
    assert got == sorted(
        [
            ("/ntp/delay", lbl, 2.0, None),
            ("/ntp/offset", lbl, 0.5, None),
            ("/ntp/jitter", lbl, 0.125, None),
        ],
        key=lambda t: (t[0], sorted(t[1].items())),
    )


def test_collectors_feed_ingest_pipeline(spark):
    """Collector output is the standard points schema — it flows
    straight through the S1/S3 ingest validate path."""
    from open_instrument_spark.model import POINTS_SCHEMA
    from open_instrument_spark.sources.ingest import validate

    pts = C.parse_mysql_status(scrape(spark, MYSQL))
    assert [(f.name, f.dataType) for f in pts.schema.fields] == [
        (f.name, f.dataType) for f in POINTS_SCHEMA.fields
    ]
    ok = validate(pts, now=dt.datetime(2024, 1, 31, 12, 0, 0))
    assert ok.count() == 5


def test_collector_parse_is_stream_safe(spark, tmp_path):
    """The parsers are stateless column expressions, so the same call
    works unchanged on a streaming scrape source — collector feeds
    plug into the streaming ingest pipeline (SURVEY §2.8)."""
    src = str(tmp_path / "scrapes")
    batch = scrape(spark, MYSQL).unionByName(
        scrape(spark, "Uptime\t7\n", hostname="h2")
    )
    batch.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "hostname string, ts timestamp, payload string"
    ).parquet(src)
    q = (
        C.parse_mysql_status(stream)
        .writeStream.format("memory")
        .queryName("collector_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = rows(spark.table("collector_stream"))
    exp = rows(C.parse_mysql_status(batch))
    assert got == exp and len(got) == 6


def test_collector_stream_to_windowed_agg_matches_batch(spark, tmp_path):
    """The full S13 → S1 → A-family composition over a STREAM: scrape
    payloads → parse_mysql_status → validate → per-name windowed SUM,
    with closed windows equal to the batch aggregation of the same
    scrapes."""
    import os

    from open_instrument_spark.model import with_series_key
    from open_instrument_spark.operators.aggregate import aggregate_by_name
    from open_instrument_spark.sources.ingest import validate
    from open_instrument_spark.streaming.ingest import windowed_agg

    def payload(i):
        return f"Aborted_clients\t{10 + i}\nThreads_running\t{i}\n"

    rows = [
        (f"h{i % 3}", dt.datetime(2024, 1, 30, 10, i), payload(i))
        for i in range(12)
    ]
    batch = spark.createDataFrame(
        rows, "hostname string, ts timestamp, payload string"
    )
    src = str(tmp_path / "cs_src")
    batch.write.parquet(src)

    now = dt.datetime(2024, 1, 30, 12, 0, 0)

    def pipeline(scrapes):
        pts = validate(C.parse_mysql_status(scrapes), now=now)
        return with_series_key(pts)

    stream = spark.readStream.schema(
        "hostname string, ts timestamp, payload string"
    ).parquet(src)
    q = (
        windowed_agg(pipeline(stream), "sum", "5 minutes",
                     watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("collector_agg_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["name"], r["ts"], r["value"])
        for r in spark.table("collector_agg_stream").collect()
    }
    want_df = aggregate_by_name(pipeline(batch), "sum", 5 * 60 * 1000)
    want = {(r["name"], r["ts"], r["value"]) for r in want_df.collect()}
    # append-mode emits only watermark-closed windows; every emitted
    # window must match batch exactly, and most windows close (the
    # final window of each name may stay open)
    assert got and got <= want
    open_windows = want - got
    assert len(open_windows) <= 2 * len({n for n, _, _ in want})


VARNISH = """client_conn         1234         1.23 Client connections accepted
client_req           987         0.50 Client requests received
cache_hit            800         0.40 Cache hits
MAIN.uptime        86400         1.00 Child process uptime
SMA.s0.g_bytes   1048576          .   Bytes outstanding
VBE.default(10.0.0.5,,8080).happy 18446744073709551615 0.00 Happy health probes
VBE.default(10.0.0.5,,8080).bereq_hdrbytes 5120 2.00 Request header bytes
esi_errors   notanumber          0.00 ESI parse errors
MEMPOOL.busyobj 5
vbe.bad(onepart).fail 5 0.00 malformed address
VBE.d(a,b,c)Xmetric 7 0.00 unescaped-dot probe
"""


def test_varnish_status(spark):
    """varnishstat -1 verbatim payload: plain counters, dotted keys
    (→ underscores, lowercased), VBE director lines (keep dots in the
    director name, backend/backend_port labels), float('1844...') ok,
    non-float skipped, short line skipped, malformed VBE address
    skipped (D15; the reference's 3-tuple unpack would crash).
    ``VBE.d(a,b,c)Xmetric`` — no dot before the metric — is NOT a
    director line (the reference regex's unescaped dot would swallow
    the X; ours escapes it) and lands in the generic branch instead."""
    got = rows(C.parse_varnish_status(scrape(spark, VARNISH)))
    h = {"hostname": "h1"}
    vbe = {"hostname": "h1", "backend": "10.0.0.5", "backend_port": "8080"}
    exp = sorted(
        [
            ("/varnish/status/client_conn", h, 1234.0, None),
            ("/varnish/status/client_req", h, 987.0, None),
            ("/varnish/status/cache_hit", h, 800.0, None),
            ("/varnish/status/main_uptime", h, 86400.0, None),
            ("/varnish/status/sma_s0_g_bytes", h, 1048576.0, None),
            ("/varnish/status/director/default/happy", vbe,
             float(18446744073709551615), None),
            ("/varnish/status/director/default/bereq_hdrbytes", vbe,
             5120.0, None),
            ("/varnish/status/vbe_d(a,b,c)xmetric", h, 7.0, None),
        ],
        key=lambda t: (t[0], sorted(t[1].items())),
    )
    assert got == exp


def test_http_fetch(spark):
    """http_fetch probe results: time + status per fetch, both gauges,
    the reference's copy-pasted units=seconds on the status variable,
    url label, fetch-START timestamp."""
    fetches = spark.createDataFrame(
        [
            ("h1", TS, "http://example.com/x", 0.125, 200),
            ("h1", TS, "http://example.com/404", 2.5, 404),
        ],
        "hostname string, ts timestamp, url string, time_s double, "
        "status int",
    )
    got = rows(C.parse_http_fetch(fetches))

    def lbl(url):
        return {"hostname": "h1", "datatype": "gauge",
                "units": "seconds", "url": url}

    exp = sorted(
        [
            ("/http_fetch/time", lbl("http://example.com/x"), 0.125, None),
            ("/http_fetch/status", lbl("http://example.com/x"), 200.0, None),
            ("/http_fetch/time", lbl("http://example.com/404"), 2.5, None),
            ("/http_fetch/status", lbl("http://example.com/404"), 404.0, None),
        ],
        key=lambda t: (t[0], sorted(t[1].items())),
    )
    assert got == exp
    assert all(r["ts"] == TS for r in C.parse_http_fetch(fetches).collect())


def test_cisco_config(spark):
    """Telnet show running-config capture → one multi-line STRING
    sample (cisco_config.py:25-60): leading blank/prompt-echo/
    'Building configuration...' lines popped, trailing blank/#exit
    lines popped, INTERIOR blanks kept, lines joined with NO separator
    (the reference's ''.join on the line list), device_type=cisco +
    hostname labels. A capture left with <=5 lines after trimming is
    dropped (the reference's len(config) > 5 guard), as is an all-junk
    capture."""
    body = ["version 15.2", "hostname rtr1", "", "interface Gi0/0",
            " ip address 10.0.0.1 255.255.255.0", "line vty 0 4", "end"]
    raw = "\r\n".join(
        ["", "rtr1#term length 0", "rtr1#show running-config",
         "Building configuration...", ""]
        + body
        + ["", "rtr1#exit", " "])
    short = "\r\n".join(["rtr1#show running-config", "version 15.2",
                         "end", "rtr1#exit"])          # 2 kept lines
    junk = "\r\n".join(["", "rtr1#term length 0", "rtr1#exit", " "])
    caps = spark.createDataFrame(
        [("h1", TS, raw), ("h2", TS, short), ("h3", TS, junk)],
        "hostname string, ts timestamp, raw string",
    )
    got = C.parse_cisco_config(caps).collect()
    assert len(got) == 1
    r = got[0]
    assert r["name"] == "/network/device/configuration"
    assert dict(r["labels"]) == {"hostname": "h1", "device_type": "cisco"}
    assert r["dval"] is None
    assert r["sval"] == "".join(body)        # separator-less reference join
    assert "interface Gi0/0 ip address" in r["sval"]   # interior blank gone
