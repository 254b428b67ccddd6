"""ASCII-protobuf store-config loader: parse → PolicyItems → executable
retention, with the reference config.txt's structural shapes (DROP item,
label-matched KEEP-forever, age-banded downsample, default drop)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from open_instrument_spark.operators.retention import apply_retention
from open_instrument_spark.sources.config import (
    load_store_config,
    parse_text_proto,
)

CONFIG = """
server {
  address: "10.0.0.1:8020"
}
server {
  address: "10.0.0.2:8020"
}
# first-match retention
retention_policy {
  policy {
    comment: "never used here"
    variable { name: "/scratch/tmpvar" }
    policy: DROP
  }
  policy {
    variable {
      name: "*"
      label {
        label: "retain"
        value: "forever"
      }
    }
    policy: KEEP
  }
  policy {
    variable { name: "*" }
    policy: KEEP
    min_age: 0
    max_age: 2419200000
  }
  policy {
    variable: { name: "*" }
    policy: KEEP
    min_age: 2419200000
    max_age: 157680000000
    mutation {
      sample_type: AVERAGE
      sample_frequency: 3600000
    }
  }
  interval: 300
}
"""

NOW = "2024-01-31 00:00:00"


def test_parse_text_proto_shapes():
    msg = parse_text_proto(CONFIG)
    assert [s["address"][0] for s in msg["server"]] == [
        "10.0.0.1:8020", "10.0.0.2:8020"
    ]
    pols = msg["retention_policy"][0]["policy"]
    assert len(pols) == 4
    assert pols[0]["policy"] == ["DROP"]
    assert pols[3]["mutation"][0]["sample_frequency"] == [3600000]


def test_load_store_config():
    cfg = load_store_config(CONFIG)
    assert cfg.servers == ("10.0.0.1:8020", "10.0.0.2:8020")
    assert cfg.retention_interval_s == 300
    p = cfg.retention
    assert [i.keep for i in p] == [False, True, True, True]
    assert p[0].variables == ("/scratch/tmpvar",)
    assert p[1].variables == ("*{retain=forever}",)
    assert p[2].max_age == 2419200000 and p[2].min_age is None
    assert p[3].mutations == (("mean", 3600000),)


def test_loaded_policy_is_executable(spark):
    cfg = load_store_config(CONFIG)
    rows = [
        ("/scratch/tmpvar", {"h": "a"}, dt.datetime(2024, 1, 30), 1.0),  # DROP
        ("/m", {"retain": "forever"}, dt.datetime(1994, 1, 1), 2.0),     # kept raw
        ("/m", {"h": "a"}, dt.datetime(2024, 1, 30), 3.0),               # young raw
        ("/m", {"h": "a"}, dt.datetime(2023, 6, 1, 0, 10), 4.0),         # downsampled
        ("/m", {"h": "a"}, dt.datetime(2023, 6, 1, 0, 20), 6.0),         # same hour
        ("/m", {"h": "a"}, dt.datetime(1994, 1, 1), 7.0),                # past 5y: drop
    ]
    df = spark.createDataFrame(
        [(n, l, t, v, None) for n, l, t, v in rows],
        "name string, labels map<string,string>, ts timestamp, dval double, sval string",
    )
    out = apply_retention(df, list(cfg.retention), NOW)
    got = sorted(r["dval"] for r in out.collect())
    assert got == [2.0, 3.0, 5.0]  # 5.0 = hourly mean of 4.0, 6.0


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_text_proto("server { address: }")
    with pytest.raises(ValueError):
        parse_text_proto("server { unclosed")
    with pytest.raises(ValueError):
        parse_text_proto("server { address:")  # truncated after ':'
    with pytest.raises(ValueError):
        load_store_config(
            "retention_policy { policy { policy: KEEP mutation { sample_type: BOGUS } } }"
        )


def test_config_scalar_where_block_required_raises_valueerror():
    """Malformed config with a scalar for a message-typed field must be
    a loud ValueError, not an AttributeError from the dict assumption."""
    import pytest

    from open_instrument_spark.sources.config import load_store_config

    with pytest.raises(ValueError, match="must be a"):
        load_store_config('server: "x"')
    with pytest.raises(ValueError, match="must be a"):
        load_store_config('retention_policy: "oops"')
    with pytest.raises(ValueError, match="must be a"):
        load_store_config('retention_policy { policy: "oops" }')


def test_render_store_config_round_trips():
    """GetConfig serialization analog (server/store.cc:86-95): rendering
    a loaded config back to the text format and re-loading it must
    reproduce the same executable policies — ages/frequencies normalized
    to proto uint64 ms, labels and quoting preserved."""
    from open_instrument_spark.sources.config import (
        StoreConfig,
        load_store_config,
        render_store_config,
    )

    text = """
server { address: "s1:8020" }
server { address: "s2:8020" }
retention_policy {
  policy {
    variable { name: "/junk/*" label { label: "dc" value: "we st" } }
    policy: DROP
  }
  policy {
    variable { name: "*" }
    policy: KEEP
    min_age: 2419200000
    max_age: 157680000000
    mutation { sample_type: AVERAGE sample_frequency: 86400000 }
    mutation { sample_type: NONE }
  }
  interval: 300
}
"""
    cfg = load_store_config(text)
    rendered = render_store_config(cfg)
    cfg2 = load_store_config(rendered)
    assert cfg2.servers == cfg.servers
    assert cfg2.retention_interval_s == cfg.retention_interval_s
    assert len(cfg2.retention) == len(cfg.retention)
    for a, b in zip(cfg.retention, cfg2.retention):
        assert a.variables == b.variables
        assert a.keep == b.keep
        assert a.min_age_ms == b.min_age_ms and a.max_age_ms == b.max_age_ms
        assert a.mutations == b.mutations
    # idempotent after one cycle
    assert render_store_config(cfg2) == rendered

    # duration-string extension normalizes to proto ms on render
    from open_instrument_spark.operators.retention import PolicyItem

    cfg3 = StoreConfig(retention=(PolicyItem(("*",), keep=True, max_age="4w"),))
    r3 = render_store_config(cfg3)
    assert "max_age: 2419200000" in r3
    assert load_store_config(r3).retention[0].max_age_ms == 2419200000

    # a config with a quoted-value label containing spaces survives
    assert any("we st" in v for it in cfg2.retention for v in it.variables)


def test_render_round_trip_property():
    """Hypothesis fuzz: any StoreConfig built from the grammar's value
    space must survive render→load exactly (ages normalized to ms)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from open_instrument_spark.operators.retention import PolicyItem
    from open_instrument_spark.sources.config import (
        StoreConfig,
        load_store_config,
        render_store_config,
    )

    name_st = st.from_regex(r"/[a-z0-9_./]{1,12}(\*)?", fullmatch=True)
    label_st = st.dictionaries(
        st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True),
        st.text(
            st.characters(
                min_codepoint=32, max_codepoint=126, exclude_characters='{}'
            ),
            max_size=8,
        ),
        max_size=2,
    )

    def pattern(draw_name, labels):
        from open_instrument_spark.canonical import canonical_variable_py

        return canonical_variable_py(draw_name, labels)

    mut_st = st.lists(
        st.tuples(
            st.sampled_from(["mean", "min", "max", "rate", "latest", "delta"]),
            st.integers(1000, 10**9),
        ),
        max_size=2,
    )
    item_st = st.builds(
        lambda n, ls, keep, mn, mx, muts: PolicyItem(
            variables=(pattern(n, ls),), keep=keep,
            min_age=mn, max_age=mx, mutations=tuple(muts),
        ),
        name_st, label_st, st.booleans(),
        st.one_of(st.none(), st.integers(1, 10**10)),
        st.one_of(st.none(), st.integers(1, 10**10)),
        mut_st,
    )
    cfg_st = st.builds(
        lambda servers, items, iv: StoreConfig(
            servers=tuple(servers), retention=tuple(items),
            retention_interval_s=iv,
        ),
        st.lists(st.from_regex(r"[a-z0-9.]{1,12}:[0-9]{2,5}", fullmatch=True),
                 max_size=3),
        st.lists(item_st, max_size=3),
        st.integers(1, 100000),
    )

    @settings(max_examples=60, deadline=None)
    @given(cfg_st)
    def check(cfg):
        # patterns must be parseable to begin with (the library contract)
        from open_instrument_spark.functions.match import VariableMatcher
        try:
            for it in cfg.retention:
                for p in it.variables:
                    VariableMatcher.from_string(p)
        except ValueError:
            return  # out-of-grammar pattern: not a valid input config
        rendered = render_store_config(cfg)
        back = load_store_config(rendered)
        assert back.servers == cfg.servers
        assert back.retention_interval_s == cfg.retention_interval_s
        assert len(back.retention) == len(cfg.retention)
        for a, b in zip(cfg.retention, back.retention):
            # inputs are canonical-form patterns, so they must survive
            # the label-block round trip verbatim
            assert a.variables == b.variables
            assert a.keep == b.keep
            assert a.min_age_ms == b.min_age_ms
            assert a.max_age_ms == b.max_age_ms
            assert [(k, __import__('open_instrument_spark.functions.durations',
                                   fromlist=['parse_duration_ms']).parse_duration_ms(f))
                    for k, f in a.mutations] == list(b.mutations)

    check()
