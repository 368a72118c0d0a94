from __future__ import annotations

from pyspark.sql import functions as F

from syslog_ng_spark.functions import (
    base64_decode,
    base64_encode,
    basename,
    dirname,
    implode,
    ipv4_to_int,
    list_head,
    list_nth,
    list_slice,
    list_tail,
    lowercase,
    num_div,
    num_mod,
    padding,
    replace_delimiter,
    stable_uuid,
    strip,
    substr,
    tf_if,
    tf_md5,
    tf_or,
    uppercase,
    url_decode,
    url_encode,
)


def one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0].v


def test_strfuncs(spark):
    s = F.lit("  Hello World  ")
    assert one(spark, lowercase(s)) == "  hello world  "
    assert one(spark, uppercase(strip(s))) == "HELLO WORLD"
    assert one(spark, substr(F.lit("abcdef"), 1, 3)) == "bcd"  # 0-based like ref
    assert one(spark, substr(F.lit("abcdef"), 2)) == "cdef"
    assert one(spark, replace_delimiter(F.lit("a,b;c"), ",;", "-")) == "a-b-c"
    assert one(spark, padding(F.lit("7"), 3, "0")) == "007"


def test_fname_funcs(spark):
    p = F.lit("/var/log/syslog.d/app.log")
    assert one(spark, basename(p)) == "app.log"
    assert one(spark, dirname(p)) == "/var/log/syslog.d"
    assert one(spark, dirname(F.lit("plain"))) == "."
    assert one(spark, dirname(F.lit("/root"))) == "/"


def test_numfuncs(spark):
    assert one(spark, num_div(F.lit(7), F.lit(2))) == 3
    assert one(spark, num_mod(F.lit(7), F.lit(2))) == 1


def test_listfuncs(spark):
    arr = F.array(F.lit("a"), F.lit("b"), F.lit("c"))
    assert one(spark, list_head(arr)) == "a"
    assert one(spark, list_tail(arr)) == ["b", "c"]
    assert one(spark, list_nth(arr, 1)) == "b"  # 0-based
    assert one(spark, list_slice(arr, 1, 3)) == ["b", "c"]
    assert one(spark, implode(arr, "-")) == "a-b-c"


def test_condfuncs(spark):
    assert one(spark, tf_if(F.lit(1) > 0, F.lit("y"), F.lit("n"))) == "y"
    assert one(spark, tf_or(F.lit(""), F.lit(None).cast("string"), F.lit("x"))) == "x"


def test_hash_url_base64(spark):
    assert one(spark, tf_md5(F.lit("abc"))) == "900150983cd24fb0d6963f7d28e17f72"
    u = one(spark, stable_uuid(F.lit("a"), F.lit("b")))
    assert len(u) == 36 and u.count("-") == 4
    assert u == one(spark, stable_uuid(F.lit("a"), F.lit("b")))  # deterministic
    assert one(spark, url_decode(url_encode(F.lit("a b&c")))) == "a b&c"
    assert one(spark, base64_decode(base64_encode(F.lit("hello")))) == "hello"


def test_ipfuncs(spark):
    assert one(spark, ipv4_to_int(F.lit("0.0.0.1"))) == 1
    assert one(spark, ipv4_to_int(F.lit("255.255.255.255"))) == 4294967295


def test_value_pairs_scopes_and_rekey(spark):
    """value-pairs selection semantics (lib/value-pairs/value-pairs.c):
    scope picks by name shape, --key adds, --exclude removes, rekey
    transforms names."""
    from pyspark.sql import functions as F

    from syslog_ng_spark.functions.format import format_json_scoped, value_pairs

    df = spark.createDataFrame(
        [(1, "h1", {"user": "bob", ".classifier.class": "violation", ".SDATA.m.seq": "7"})],
        "id long, host string, nv map<string,string>",
    )

    def render(**opts):
        return df.select(
            format_json_scoped(F.col("nv"), core={"HOST": F.col("host")}, **opts).alias("js")
        ).collect()[0].js

    assert render(scope="nv-pairs") == '{"user":"bob"}'
    assert (
        render(scope="dot-nv-pairs")
        == '{".SDATA.m.seq":"7",".classifier.class":"violation"}'
    )
    assert render(scope="sdata") == '{".SDATA.m.seq":"7"}'
    assert render(scope="rfc3164") == '{"HOST":"h1"}'
    assert (
        render(scope="rfc3164 nv-pairs", exclude=["user"]) == '{"HOST":"h1"}'
    )
    assert (
        render(scope="nv-pairs", key=[".classifier.*"])
        == '{".classifier.class":"violation","user":"bob"}'
    )
    assert (
        render(scope="nv-pairs", rekey_add_prefix="np.") == '{"np.user":"bob"}'
    )
    assert (
        render(scope="sdata", rekey_replace_prefix=(".SDATA.", "sd."))
        == '{"sd.m.seq":"7"}'
    )
    # shift drops leading chars (transforms.c value_pairs_new_transform_shift)
    assert render(scope="sdata", rekey_shift=1) == '{"SDATA.m.seq":"7"}'
    # map form, not just json
    m = df.select(value_pairs(F.col("nv"), scope="nv-pairs").alias("m")).collect()[0].m
    assert m == {"user": "bob"}


def test_value_pairs_json_escaping(spark):
    from pyspark.sql import functions as F

    from syslog_ng_spark.functions.format import format_json_scoped

    df = spark.createDataFrame([({'q': 'say "hi" \\ bye'},)], "nv map<string,string>")
    js = df.select(format_json_scoped(F.col("nv"), scope="nv-pairs").alias("js")).collect()[0].js
    assert js == '{"q":"say \\"hi\\" \\\\ bye"}'
    import json

    assert json.loads(js) == {"q": 'say "hi" \\ bye'}


def test_value_pairs_key_collision_overrides(spark):
    """An NV name shadowing a core name (or an explicit pair) must
    override, not crash with DUPLICATED_MAP_KEY."""
    from pyspark.sql import functions as F

    from syslog_ng_spark.functions.format import format_json_scoped

    df = spark.createDataFrame(
        [("h-core", {"HOST": "h-nv", "x": "1"})], "host string, nv map<string,string>"
    )
    js = df.select(
        format_json_scoped(
            F.col("nv"), core={"HOST": F.col("host")}, scope="rfc3164 nv-pairs"
        ).alias("js")
    ).collect()[0].js
    assert js == '{"HOST":"h-nv","x":"1"}'
    # explicit pairs override the NV selection
    js2 = df.select(
        format_json_scoped(
            F.col("nv"), scope="nv-pairs", pairs={"x": F.lit("9")}
        ).alias("js")
    ).collect()[0].js
    assert js2 == '{"HOST":"h-nv","x":"9"}'


def test_merge_maps_self_arms_dedup_policy(spark):
    """The driver gate runs a VANILLA session (default
    mapKeyDedupPolicy=EXCEPTION, where map_concat on a duplicate key
    kills the job). _merge_maps must set LAST_WIN on the active
    session at expression-build time so value_pairs works anywhere."""
    from pyspark.sql import functions as F

    from syslog_ng_spark.functions.format import _merge_maps

    spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    try:
        m1 = F.create_map(F.lit("k"), F.lit("old"), F.lit("a"), F.lit("1"))
        m2 = F.create_map(F.lit("k"), F.lit("new"))
        got = spark.range(1).select(_merge_maps(m1, m2).alias("m")).first()["m"]
        assert got == {"k": "new", "a": "1"}  # no DUPLICATED_MAP_KEY, last wins
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")


def test_list_search_modes_and_start_index(spark):
    from syslog_ng_spark.functions.listfuncs import list_search

    df = spark.createDataFrame([(["alpha", "beta", "gamma", "beta"],)], "arr array<string>")
    r = df.select(
        list_search(F.col("arr"), "beta").alias("lit"),
        list_search(F.col("arr"), "ga", "prefix").alias("pre"),
        list_search(F.col("arr"), "et", "substring").alias("sub"),
        list_search(F.col("arr"), "^b.ta$", "pcre").alias("rex"),
        list_search(F.col("arr"), "beta", start_index=2).alias("si"),
        list_search(F.col("arr"), "zz").alias("miss"),
    ).collect()[0]
    assert (r.lit, r.pre, r.sub, r.rex, r.si, r.miss) == ("1", "2", "1", "1", "3", "")


def test_numeric_list_aggregates_skip_non_numbers(spark):
    from syslog_ng_spark.functions.numfuncs import (
        binary_chars,
        num_average,
        num_max,
        num_min,
        num_sum,
    )

    df = spark.createDataFrame([(["3", "7", "x", "-5"],)], "arr array<string>")
    r = df.select(
        num_sum(F.col("arr")).alias("s"),
        num_min(F.col("arr")).alias("mn"),
        num_max(F.col("arr")).alias("mx"),
        num_average(F.col("arr")).alias("avg"),
        binary_chars(72, 105).alias("b"),
    ).collect()[0]
    assert (r.s, r.mn, r.mx, r.avg, r.b) == (5, -5, 7, 1, "Hi")
    empty = spark.createDataFrame([(["x", "y"],)], "arr array<string>")
    assert empty.select(num_average(F.col("arr")).alias("a")).collect()[0].a is None


def test_cee_parser_marker(spark):
    from syslog_ng_spark.operators.app_parsers import cee_parser

    df = spark.createDataFrame(
        [('@cee: {"a":"1"}',), ("no marker",)], "message string"
    )
    rows = {r.message: r for r in cee_parser(df).collect()}
    assert rows['@cee: {"a":"1"}'].is_cee
    assert dict(rows['@cee: {"a":"1"}'].sdata) == {".cee.a": "1"}
    assert not rows["no marker"].is_cee and rows["no marker"].sdata is None


def test_format_gelf_omit_empty_and_typed(spark):
    from pyspark.sql import functions as F

    from syslog_ng_spark.functions.format import format_gelf, gelf_frame

    df = spark.createDataFrame(
        [("web1", "disk full", 3, 1700000000, "", None)],
        "host string, msg string, lvl int, ut long, prog string, pid int",
    )
    gelf = format_gelf(
        host=F.col("host"),
        short_message=F.col("msg"),
        level_num=F.col("lvl"),
        r_unixtime=F.col("ut"),
        program=F.col("prog"),  # empty -> omitted
        pid=F.col("pid"),  # null -> omitted
    )
    out = df.select(gelf.alias("g"), gelf_frame(gelf).alias("framed")).collect()[0]
    assert out.g == (
        '{"version":"1.1","host":"web1","short_message":"disk full",'
        '"level":3,"timestamp":1700000000}'
    )
    assert out.framed == out.g + "\x00"


def test_format_gelf_null_host_defaults_and_escape(spark):
    from pyspark.sql import functions as F

    from syslog_ng_spark.functions.format import format_gelf

    df = spark.createDataFrame([(None, 'say "hi"')], "host string, msg string")
    g = df.select(
        format_gelf(host=F.col("host"), short_message=F.col("msg")).alias("g")
    ).collect()[0].g
    assert g == '{"version":"1.1","host":"-","short_message":"say \\"hi\\""}'


def test_format_cim_batch_transforms(spark):
    from pyspark.sql import functions as F

    from syslog_ng_spark.functions.format import format_cim

    nv = F.create_map(
        F.lit(".cim.user"), F.lit("alice"),
        F.lit("_raw"), F.lit("x"),
        F.lit(".classifier.class"), F.lit("login"),
        F.lit("net.if"), F.lit("eth0"),
    )
    df = spark.createDataFrame([(1,)], "i int")
    out = df.select(
        format_cim(nv, r_isodate=F.lit("2024-01-05T03:04:05+00:00"), msg=F.lit("m")).alias("c")
    ).collect()[0].c
    assert out == (
        '{"@message":"m","@timestamp":"2024-01-05T03:04:05+00:00",'
        '"_classifier.class":"login","_raw":"x","net.if":"eth0","user":"alice"}\n'
    )


def test_format_collectd_instance_suffixes(spark):
    from pyspark.sql import functions as F
    from syslog_ng_spark.functions.format import format_collectd

    df = spark.createDataFrame(
        [("web1", "cpu", "0", "percent", "idle", "2024-01-01 00:00:05", "97.2")],
        ["host", "plugin", "pinst", "type", "tinst", "ts", "vals"],
    )
    line = format_collectd(
        host=F.col("host"),
        plugin=F.col("plugin"),
        plugin_instance=F.col("pinst"),
        type_=F.col("type"),
        type_instance=F.col("tinst"),
        ts=F.col("ts").cast("timestamp"),
        values=F.col("vals"),
    )
    got = df.select(line.alias("l")).collect()[0]["l"]
    assert got == "PUTVAL web1/cpu-0/percent-idle interval=60 1704067205:97.2"

    # empty instances drop the '-suffix' exactly like the $(if) guards
    line2 = format_collectd(
        host=F.col("host"),
        plugin=F.col("plugin"),
        plugin_instance=F.lit(""),
        type_=F.col("type"),
        type_instance=F.lit(""),
        ts=F.col("ts").cast("timestamp"),
        values=F.lit("U"),
        interval=None,
    )
    got2 = df.select(line2.alias("l")).collect()[0]["l"]
    assert got2 == "PUTVAL web1/cpu/percent 1704067205:U"
