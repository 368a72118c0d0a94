"""Template-function registry conformance: 1:1 name coverage against
the reference's registered template-function plugins.

The reference registers template functions in plugin tables; this
sweep hardcodes every registered name with its registration site and
asserts our compiler accepts it — either compiling to a Column, or
raising a TemplateCompileError that NAMES the supported alternative
(the documented stateful/environment set). An unknown-function error
is a conformance failure.

Registration sites swept:
- modules/basicfuncs/basic-funcs.c:74-140 (the big table)
- modules/json/json-plugin.c:37-38 (format_json, format_flat_json)
- modules/cryptofuncs/cryptofuncs.c:163-170 (hash family incl. md4)
- modules/getent (getent), modules/stardate (stardate)
- modules/graphite (graphite_output), modules/geoip2 (geoip2)
- modules/cef (format-cef-extension), modules/secure-logging (slog)
- modules/python (python), lib/template/tests's "hello" is a test-only
  fixture plugin and deliberately NOT part of the surface.
"""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.template import (
    TemplateCompileError,
    compile_template,
    iterate_sequence,
)

# name → a representative invocation (reference: registration sites in
# the module docstring). None ⇒ the name must raise a
# TemplateCompileError naming an alternative ("use ...").
REGISTRY = {
    # cond-funcs.c
    "grep": '$(grep ("$level" eq "err") $msg)',
    "if": '$(if ("$m" eq "x") a b)',
    "or": "$(or $m fallback)",
    # context-funcs.c
    "context-lookup": '$(context-lookup ("$level" eq "err") $msg)',
    "context-length": "$(context-length)",
    "context-values": "$(context-values $msg)",
    # str-funcs.c
    "echo": "$(echo $m)",
    "length": "$(length $m)",
    "substr": "$(substr $m 1 2)",
    "strip": "$(strip $m)",
    "sanitize": "$(sanitize $m)",
    "lowercase": "$(lowercase $m)",
    "uppercase": "$(uppercase $m)",
    "replace-delimiter": '$(replace-delimiter ";" "," $m)',
    "padding": "$(padding $m 10)",
    "binary": "$(binary 0x48 73)",
    "implode": "$(implode ; $l)",
    "explode": "$(explode ; $m)",
    # fname-funcs.c
    "dirname": "$(dirname $m)",
    "basename": "$(basename $m)",
    # list-funcs.c
    "list-concat": "$(list-concat $l $l)",
    "list-head": "$(list-head $l)",
    "list-nth": "$(list-nth 1 $l)",
    "list-tail": "$(list-tail $l)",
    "list-slice": "$(list-slice 0:2 $l)",
    "list-count": "$(list-count $l)",
    "list-append": "$(list-append $l z)",
    "list-search": "$(list-search --mode prefix b $l)",
    # numeric-funcs.c
    "+": "$(+ $n 1)",
    "-": "$(- $n 1)",
    "*": "$(* $n 2)",
    "/": "$(/ $n 2)",
    "%": "$(% $n 2)",
    "sum": "$(sum $l)",
    "min": "$(min $l)",
    "max": "$(max $l)",
    "average": "$(average $l)",
    "round": "$(round $n 1)",
    "ceil": "$(ceil $n)",
    "floor": "$(floor $n)",
    # ip-funcs.c
    "ipv4-to-int": "$(ipv4-to-int $ip)",
    "indent-multi-line": "$(indent-multi-line $m)",
    "dns-resolve-ip": "$(dns-resolve-ip $ip)",
    # misc-funcs.c
    "env": "$(env HOME)",
    # tf-template.c
    "template": "$(template greet)",
    # urlencode.c
    "url-encode": "$(url-encode $m)",
    "url-decode": "$(url-decode $m)",
    "base64-encode": "$(base64-encode $m)",
    # tf-iterate.c / tf-map.c / tf-filter.c
    "iterate": None,  # stateful: names iterate_sequence
    "map": "$(map $(+ $_ 1) $l)",
    "filter": '$(filter ("$_" ne "b") $l)',
    # modules/json/json-plugin.c
    "format_json": "$(format_json k=$m)",
    "format_flat_json": "$(format_flat_json k=$m)",
    # modules/basicfuncs registration of format-welf lives in
    # modules/kvformat; format-cef-extension in modules/cef
    "format-welf": "$(format-welf k=$m)",
    "format-cef-extension": "$(format-cef-extension k=$m)",
    # modules/cryptofuncs/cryptofuncs.c
    "md4": "$(md4 $m)",
    "md5": "$(md5 $m)",
    "sha1": "$(sha1 $m)",
    "sha256": "$(sha256 --length 16 $m)",
    "sha512": "$(sha512 $m)",
    "hash": "$(hash $m)",
    "uuid": "$(uuid $m)",
    # modules/getent, modules/stardate, modules/graphite
    "getent": "$(getent protocols tcp)",
    "stardate": "$(stardate --digits 2 $ts)",
    "graphite_output": "$(graphite_output k=$m)",
    # modules/geoip2, modules/secure-logging, modules/python
    "geoip2": None,
    "slog": None,
    "python": "$(python myfn $m)",
}


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("hello;b", "a,b,c", "4", "127.0.0.1", "2024-07-01 12:00:00", "err",
          [(1, "err", "disk"), (2, "info", "ok")])],
        "m string, l string, n string, ip string, ts string, level string,"
        " ctx array<struct<event_id:int, level:string, msg:string>>",
    )


def _compile(text, df):
    return compile_template(
        text,
        df,
        templates={"greet": "hi $m"},
        context_col="ctx",
        python_funcs={"myfn": lambda s: s.upper()},
    )


def test_registry_full_name_coverage(df):
    """Every reference-registered name compiles or redirects by name."""
    unknown, failed = [], []
    for name, invocation in REGISTRY.items():
        if invocation is None:
            with pytest.raises(TemplateCompileError) as ei:
                compile_template(f"$({name} $m)", df)
            assert "unknown template function" not in str(ei.value), name
            assert "use" in str(ei.value) or "usage" in str(ei.value), (
                f"$({name}) loud-fail must name the alternative: {ei.value}"
            )
            continue
        try:
            col = _compile(invocation, df)
        except TemplateCompileError as e:
            if "unknown template function" in str(e):
                unknown.append(name)
            else:
                failed.append((name, str(e)))
            continue
        assert col is not None
    assert not unknown, f"names missing from the compiler registry: {unknown}"
    assert not failed, f"names that failed to compile: {failed}"


def test_dash_underscore_interchangeable(df):
    """plugin.c:153 treats '-'/'_' as one character in plugin names."""
    a = df.select(_compile("$(format_json k=$m)", df).alias("v")).collect()[0][0]
    b = df.select(_compile("$(format-json k=$m)", df).alias("v")).collect()[0][0]
    assert a == b == '{"k":"hello;b"}'


def _one(df, text, **kw):
    return df.select(compile_template(text, df, **kw).alias("v")).collect()[0][0]


def test_explode_implode_roundtrip(df):
    assert _one(df, "$(explode ; $m)") == "hello,b"
    assert _one(df, "$(implode ; $l)") == "a;b;c"
    assert _one(df, "$(implode ; $(explode ; $m))") == "hello;b"


def test_list_ops(df):
    assert _one(df, "$(list-append $l z)") == "a,b,c,z"
    assert _one(df, "$(list-concat $l $l)") == "a,b,c,a,b,c"
    assert _one(df, "$(list-slice 1:2 $l)") == "b"
    assert _one(df, "$(list-slice 1: $l)") == "b,c"
    assert _one(df, "$(list-slice :2 $l)") == "a,b"
    assert _one(df, "$(list-search b $l)") == "1"
    assert _one(df, "$(list-search --mode glob c* $l)") == "2"
    assert _one(df, "$(list-search --start-index 2 b $l)") == ""


def test_numeric_aggregates_skip_non_numeric(df):
    """numeric-funcs.c skips elements parse_number rejects."""
    assert _one(df, '$(sum "1,2,x,3")') == "6"
    assert _one(df, '$(min "5,2,x")') == "2"
    assert _one(df, '$(max "5,2,x")') == "5"
    assert _one(df, '$(average "1,2,4")') == "2"  # truncating int64


def test_hash_family(df):
    msg = "hello;b"
    assert _one(df, "$(sha512 $m)") == hashlib.sha512(msg.encode()).hexdigest()
    assert _one(df, "$(md4 abc)") == "a448017aaf21d8525fc10ae87aa6729d"
    assert _one(df, "$(md5 --length 8 $m)") == hashlib.md5(msg.encode()).hexdigest()[:8]
    # args concatenate with no separator (cryptofuncs _hash loop)
    assert _one(df, "$(sha1 a b)") == hashlib.sha1(b"ab").hexdigest()


def test_env_binary(df):
    assert _one(df, "$(env HOME)") == os.environ["HOME"]
    assert _one(df, "$(env __SPARK_GRAFT_UNSET_VAR__)") == ""
    assert _one(df, "$(binary 0x48 0x49 33)") == "HI!"
    with pytest.raises(TemplateCompileError):
        compile_template("$(binary 999)", df)


def test_getent_and_dns(df):
    # root is uid 0 everywhere; loopback is in every hosts file
    assert _one(df, "$(getent passwd 0)") == "root"
    assert _one(df, "$(getent passwd root)") == "0"
    assert _one(df, "$(getent passwd root dir)") == "/root"
    assert _one(df, "$(dns-resolve-ip $ip)") == "localhost"
    assert _one(df, '$(dns-resolve-ip "203.0.113.9")') == "203.0.113.9"  # unknown → ip


def test_getent_fixture_dir(tmp_path):
    from syslog_ng_spark.functions.sysfuncs import getent_table

    (tmp_path / "services").write_text("web 8080/tcp www\n# comment\n")
    t = getent_table("services", etc_dir=str(tmp_path))
    assert t[("8080", "")] == "web"
    assert t[("web", "")] == "8080"
    assert t[("www", "")] == "8080"  # alias


def test_template_static_dynamic(df):
    tpls = {"greet": "hi $m", "outer": "[$(template greet)]"}
    assert _one(df, "$(template greet)", templates=tpls) == "hi hello;b"
    assert _one(df, "$(template outer)", templates=tpls) == "[hi hello;b]"
    # dynamic: name carries a '$' → runtime lookup with fallback
    assert _one(df, "$(template ${level}x fb)", templates={"errx": "E!$n"}) == "E!4"
    assert _one(df, "$(template ${level}zz fb1 fb2)", templates={"errx": "E"}) == "fb1 fb2"
    with pytest.raises(TemplateCompileError, match="Unknown template"):
        compile_template("$(template nope)", df, templates=tpls)


def test_context_functions(df):
    kw = {"context_col": "ctx"}
    assert _one(df, "$(context-length)", **kw) == "2"
    assert _one(df, "$(context-values $msg)", **kw) == "disk,ok"
    assert _one(df, '$(grep ("$level" eq "err") $msg)', **kw) == "disk"
    assert _one(df, '$(grep ("$event_id" < "3") $msg $level)', **kw) == "disk,err,ok,info"
    assert _one(df, '$(grep --max-count 1 ("$event_id" < "3") $msg)', **kw) == "disk"
    with pytest.raises(TemplateCompileError, match="grouping"):
        compile_template("$(context-length)", df)


def test_python_function(df):
    assert _one(df, "$(python myfn $m)", python_funcs={"myfn": lambda s: s.upper()}) == "HELLO;B"
    with pytest.raises(TemplateCompileError, match="not registered"):
        compile_template("$(python nope $m)", df, python_funcs={})


def test_map_filter_scoping(df):
    assert _one(df, '$(map $(uppercase $_) $l)') == "A,B,C"
    assert _one(df, '$(filter ("$_" ne "b") $l)') == "a,c"
    # non-$_ names inside map still resolve against the row (tf-map.c
    # renders against the original message with context_id = element)
    assert _one(df, '$(map $(echo $_$n) $l)') == "a4,b4,c4"


def test_graphite_output(df):
    v = _one(df, '$(graphite_output --timestamp "1000" k=$n)')
    assert v == "k 4 1000\n"


def test_format_cef_extension_escaping(spark):
    df = spark.createDataFrame([("a=b\\c\nd",)], "m string")
    v = df.select(compile_template("$(format-cef-extension k=$m act=ok)", df).alias("v")).collect()[0][0]
    assert v == "k=a\\=b\\\\c\\nd act=ok"


def test_stardate(df):
    v = _one(df, "$(stardate --digits 2 $ts)")
    assert v.startswith("2024.") and len(v.split(".")[1]) == 2


def test_iterate_sequence(spark):
    seq = spark.createDataFrame([(i,) for i in range(4)], "n int")
    got = [r[0] for r in iterate_sequence(seq, "$(+ $_ 3)", "10", "n", partition_by=F.lit(1)).orderBy("n").select("iterated").collect()]
    assert got == ["10", "13", "16", "19"]
    got = [r[0] for r in iterate_sequence(seq, "$(* $_ 2)", "1", "n", partition_by=F.lit(1)).orderBy("n").select("iterated").collect()]
    assert got == ["1", "2", "4", "8"]
    with pytest.raises(NotImplementedError, match="affine"):
        iterate_sequence(seq, "$(lowercase $_)", "a", "n")
