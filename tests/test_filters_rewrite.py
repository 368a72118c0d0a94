from __future__ import annotations

from pyspark.sql import functions as F

from syslog_ng_spark.operators.filters import (
    facility_filter,
    in_list_filter,
    in_list_join,
    netmask_filter,
    severity_at_least,
    severity_filter,
    tags_filter,
)
from syslog_ng_spark.operators.rewrite import (
    clear_tag,
    groupset,
    map_value_pairs,
    set_severity,
    set_tag,
    subst,
    unset_map_keys,
)


def _logs(spark):
    return spark.createDataFrame(
        [
            (1, 3, 16, "disk error", ["a"]),
            (2, 6, 4, "login ok", ["a", "b"]),
            (3, 0, 0, "kernel panic", []),
        ],
        "id int, severity int, facility int, message string, tags array<string>",
    )


def test_severity_semantics(spark):
    df = _logs(spark)
    assert df.where(severity_at_least(F.col("severity"), "err")).count() == 2  # sev<=3
    assert df.where(severity_filter(F.col("severity"), "info")).count() == 1
    assert df.where(severity_filter(F.col("severity"), "emerg", "err")).count() == 2


def test_facility_names(spark):
    df = _logs(spark)
    assert df.where(facility_filter(F.col("facility"), "kern", "auth")).count() == 2
    assert df.where(facility_filter(F.col("facility"), "local0")).count() == 1


def test_netmask_edges(spark):
    df = spark.createDataFrame(
        [("10.0.0.0",), ("10.0.0.255",), ("10.0.1.0",), ("9.255.255.255",)], "ip string"
    )
    got = [r.ip for r in df.where(netmask_filter(F.col("ip"), "10.0.0.0/24")).collect()]
    assert got == ["10.0.0.0", "10.0.0.255"]


def test_netmask6_against_stdlib_ipaddress(spark):
    """Randomized parity with the stdlib ipaddress module (independent
    ground truth): 60 addresses in every textual form str() emits
    (compressed '::', mapped v4) against prefixes spanning both 64-bit
    halves, plus the hand-picked edges /1, /64, /65, /128 and mapped."""
    import ipaddress
    import random

    from syslog_ng_spark.operators.filters import netmask6_filter

    rng = random.Random(5424)
    addrs = []
    for _ in range(40):
        # bias toward structured addresses so prefixes actually match
        hi = rng.choice([0x20010DB8 << 32, 0xFE800000 << 32, 0]) | rng.getrandbits(40)
        lo = rng.getrandbits(rng.choice([8, 32, 64]))
        addrs.append(str(ipaddress.IPv6Address((hi << 64) | lo)))
    for _ in range(10):
        addrs.append(str(ipaddress.IPv6Address(0xFFFF00000000 | rng.getrandbits(32))))
    addrs += ["::", "::1", "2001:db8::", "fe80::1%0".replace("%0", ""), "::ffff:10.16.3.4"]
    df = spark.createDataFrame([(a,) for a in addrs], "ip string")
    nets = [
        "2001:db8::/32", "2001:db8::/64", "2001:db8::/65", "2001:db8::1/128",
        "fe80::/10", "8000::/1", "::ffff:10.16.0.0/108", "::ffff:0:0/96",
    ]
    for net in nets:
        got = {r.ip for r in df.where(netmask6_filter(F.col("ip"), net)).collect()}
        want = {
            a for a in addrs
            if ipaddress.IPv6Address(a) in ipaddress.IPv6Network(net, strict=False)
        }
        assert got == want, f"{net}: got {got ^ want} disagreement"


def test_netmask6_invalid_prefix_raises(spark):
    """Reference treats prefix outside [1,128] as an invalid filter
    (never matches); a batch engine should refuse the config loudly."""
    import pytest

    from syslog_ng_spark.operators.filters import netmask6_filter

    for bad in ("::/0", "2001:db8::/129", "2001:db8::/-1"):
        with pytest.raises(ValueError):
            netmask6_filter(F.col("ip"), bad)


def test_in_list_join_matches_isin(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "v int")
    lst = spark.createDataFrame([(3,), (50, ), (99,)], "x int")
    a = sorted(r.v for r in df.where(in_list_filter(F.col("v"), [3, 50, 99])).collect())
    b = sorted(r.v for r in in_list_join(df, "v", lst, "x").collect())
    assert a == b == [3, 50, 99]


def test_tags_filter_and_rewrite(spark):
    df = _logs(spark)
    assert df.where(tags_filter(F.col("tags"), "b")).count() == 1
    tagged = set_tag(df, "new")
    assert all("new" in r.tags for r in tagged.collect())
    cleared = clear_tag(tagged, "a")
    assert all("a" not in r.tags for r in cleared.collect())


def test_subst_and_set_severity(spark):
    df = _logs(spark)
    out = subst(df, "message", "error", "E")
    assert [r.message for r in out.orderBy("id").collect()][0] == "disk E"
    sev = set_severity(df, "debug", condition=F.col("id") == 1)
    got = {r.id: r.severity for r in sev.collect()}
    assert got == {1: 7, 2: 6, 3: 0}


def test_map_rewrites(spark):
    df = spark.createDataFrame(
        [({"a": "1", "b": "2"},)], "m map<string,string>"
    )
    renamed = map_value_pairs(df, "m", {"a": "alpha"}).collect()[0].m
    assert renamed == {"alpha": "1", "b": "2"}
    dropped = unset_map_keys(df, "m", "b").collect()[0].m
    assert dropped == {"a": "1"}
    upper = groupset(df, "m", lambda k, v: F.upper(v)).collect()[0].m
    assert upper == {"a": "1", "b": "2"}


def test_geoip_range_enrich_plan_and_values(spark):
    """Range lookup must be a broadcast HASH join on the prefix
    bucket (no BroadcastNestedLoopJoin over the fact side)."""
    from pyspark.sql import functions as F

    from syslog_ng_spark.operators.enrich import geoip_range_enrich

    events = spark.createDataFrame(
        [(1, "10.0.0.5"), (2, "10.0.156.20"), (3, "10.31.0.1")],
        "id long, ip string",
    )
    # 10.0.0.0-10.0.155.255 -> geo-a (spans 156 /16-sub buckets? no:
    # /16 bucketing, range spans buckets 2560..2560); second range in a gap test
    ranges = spark.createDataFrame(
        [(167772160, 167812159, "geo-a")],  # 10.0.0.0 .. 10.0.156.63
        "start_int long, end_int long, geo_name string",
    )
    out = geoip_range_enrich(events, ranges, ip_col="ip")
    got = {r.id: r.geo_name for r in out.collect()}
    assert got[1] == "geo-a" and got[2] == "geo-a" and got[3] is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_timezone_rewrites(spark):
    import datetime as dt

    from syslog_ng_spark.operators.rewrite import fix_timezone, set_timezone

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1, 12, 0, 0))], "id long, ts timestamp"
    )
    # wall clock 12:00 was actually CEST (UTC+2) -> instant is 10:00 UTC
    fixed = fix_timezone(df, "Europe/Berlin").collect()[0].ts
    assert fixed == dt.datetime(2024, 6, 1, 10, 0, 0)
    # rendering 12:00 UTC in Berlin local time gives 14:00
    local = set_timezone(df, "Europe/Berlin").collect()[0].ts_local
    assert local == dt.datetime(2024, 6, 1, 14, 0, 0)


def test_match_store_groups_and_template(spark):
    from syslog_ng_spark.operators.filters import match_store
    from syslog_ng_spark.template import compile_template

    df = spark.createDataFrame(
        [(1, "user=alice uid=42"), (2, "no kv here"), (3, "user=bob uid=7")],
        "i long, message string",
    )
    out = match_store(df, "message", r"user=(\w+) uid=(\d+)")
    rows = {r.i: r for r in out.collect()}
    assert sorted(rows) == [1, 3]  # non-matching row filtered
    assert rows[1].sdata["0"] == "user=alice uid=42"
    assert rows[1].sdata["1"] == "alice" and rows[1].sdata["2"] == "42"
    rendered = out.select("i", compile_template("$1/$2", out).alias("t")).collect()
    assert {r.i: r.t for r in rendered} == {1: "alice/42", 3: "bob/7"}


def test_match_store_merges_existing_sdata(spark):
    from pyspark.sql import functions as F

    from syslog_ng_spark.operators.filters import match_store

    df = spark.createDataFrame([(1, "x=9")], "i long, message string").withColumn(
        "sdata", F.create_map(F.lit(".k"), F.lit("v"))
    )
    r = match_store(df, "message", r"x=(\d)").collect()[0]
    assert r.sdata[".k"] == "v" and r.sdata["1"] == "9"


def test_cmp_filter_atoi_and_string_modes(spark):
    from syslog_ng_spark.operators.filters import cmp_filter

    df = spark.createDataFrame(
        [(1, "5", "abc"), (2, "notnum", "abd"), (3, "  +7x", "ab")],
        "i long, n string, s string",
    )
    # atoi: '5'->5, 'notnum'->0, '  +7x'->7
    kept = df.where(cmp_filter(df, "$n", "4", ">", numeric=True))
    assert sorted(r.i for r in kept.collect()) == [1, 3]
    zero = df.where(cmp_filter(df, "$n", "0", "==", numeric=True))
    assert [r.i for r in zero.collect()] == [2]
    # string mode: byte-wise
    s = df.where(cmp_filter(df, "$s", "abc", ">=", numeric=False))
    assert sorted(r.i for r in s.collect()) == [1, 2]


def test_credit_card_mask_conf_shapes(spark):
    """cc-mask.conf documented behavior: first6 + '******' + last4, all
    card families, global flag (both cards in one message), non-card
    digit runs untouched."""
    from syslog_ng_spark.operators.rewrite import credit_card_mask

    df = spark.createDataFrame(
        [
            (1, "pay 4111111111111111 ok"),            # Visa 16
            (2, "visa13 4222222222222 end"),            # Visa 13
            (3, "mc 5500005555555559"),                 # MasterCard
            (4, "amex 378282246310005 then 6011000990139424"),  # Amex + Discover
            (5, "diners 30569309025904 jcb 3530111333300000"),
            (6, "not a card: 1234567890 or 99999"),
            (7, ""),
        ],
        "i long, message string",
    )
    got = {r.i: r.message for r in credit_card_mask(df, "message").collect()}
    assert got[1] == "pay 411111******1111 ok"
    assert got[2] == "visa13 422222******2222 end"
    assert got[3] == "mc 550000******5559"
    assert got[4] == "amex 378282******0005 then 601100******9424"
    assert got[5] == "diners 305693******5904 jcb 353011******0000"
    assert got[6] == "not a card: 1234567890 or 99999"
    assert got[7] == ""


def test_credit_card_hash_sha1_matches_hashlib(spark):
    """The conf's replacement is '$(sha1 --length 16 $1)' — pin the
    default algo to hashlib's sha1, truncated to 16 hex chars."""
    import hashlib

    from syslog_ng_spark.operators.rewrite import credit_card_hash

    pan1, pan2 = "4111111111111111", "378282246310005"
    df = spark.createDataFrame(
        [(1, f"a {pan1} b {pan2} c"), (2, "no card")], "i long, message string"
    )
    got = {r.i: r.message for r in credit_card_hash(df, "message").collect()}
    h1 = hashlib.sha1(pan1.encode()).hexdigest()[:16]
    h2 = hashlib.sha1(pan2.encode()).hexdigest()[:16]
    assert got[1] == f"a {h1} b {h2} c"
    assert got[2] == "no card"
    # equal cards hash equal across messages (the correlation property)
    df2 = spark.createDataFrame(
        [(1, f"x {pan1}"), (2, f"y {pan1}")], "i long, message string"
    )
    vals = {r.message.split()[1] for r in credit_card_hash(df2, "message").collect()}
    assert vals == {h1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        credit_card_hash(df, "message", algo="crc32")


def test_subst_per_match_condition_gate(spark):
    """condition() on the rewrite leaves non-matching rows byte-identical
    (same contract as subst/set)."""
    from syslog_ng_spark.operators.rewrite import (
        CREDIT_CARD_REGEX,
        subst_per_match,
    )

    df = spark.createDataFrame(
        [(1, "pay 4111111111111111"), (2, "pay 4111111111111111")],
        "i long, message string",
    )
    out = subst_per_match(
        df, "message", CREDIT_CARD_REGEX,
        lambda m: F.lit("X"), condition=F.col("i") == 1,
    )
    got = {r.i: r.message for r in out.collect()}
    assert got[1] == "pay X"
    assert got[2] == "pay 4111111111111111"


def test_subst_per_match_property_vs_re(spark):
    """Adversarial regex-engine parity (r7 verdict item 6): the cc
    gates rest on Spark's split/regexp_extract_all agreeing with a
    global leftmost non-overlapping matcher on every edge. Property:
    subst_per_match == Python re.sub(pattern, render(group 1)) on
    random PAN-embedding strings — adjacent matches, matches at both
    ends, 13/15/16-digit brands, near-miss digit runs, digit runs
    longer than a PAN, separators that split runs."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from syslog_ng_spark.operators.rewrite import (
        CREDIT_CARD_REGEX,
        subst_per_match,
    )

    pans = st.sampled_from([
        "4111111111111111",        # visa 16
        "4222222222222",           # visa 13
        "5500005555555559",        # mastercard
        "6011000990139424",        # discover
        "378282246310005",         # amex 15
        "30569309025904",          # diners 14
        "3530111333300000",        # jcb
        "1800000000000000",        # jcb 1800-prefix (15+1)
    ])
    near_miss = st.sampled_from([
        "4111",                    # too short
        "9999999999999999",        # no brand prefix
        "41111111111111112222",    # 20-digit run: prefix still matches
        "5600005555555559",        # 56 is not a mastercard prefix
        "",
    ])
    filler = st.text(
        alphabet=" abz-:.,#0123456789$()[]*+?|\\^",
        min_size=0, max_size=8,
    )
    piece = st.one_of(pans, near_miss, filler)

    def render_py(m: re.Match) -> str:
        g = m.group(1)
        return g[:6] + "******" + g[-4:]

    @settings(max_examples=40, deadline=None)
    @given(st.lists(piece, min_size=0, max_size=6))
    def check(pieces):
        texts = ["".join(pieces)]
        expect = [re.sub(CREDIT_CARD_REGEX, render_py, t) for t in texts]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, message string"
        )
        out = subst_per_match(
            df, "message", CREDIT_CARD_REGEX,
            lambda m: F.concat(
                F.substring(m, 1, 6), F.lit("******"),
                m.substr(F.length(m) - 3, F.lit(4)),
            ),
        )
        got = [r.message for r in out.orderBy("i").collect()]
        assert got == expect, (texts, got, expect)

    check()
