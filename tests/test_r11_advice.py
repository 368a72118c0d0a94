"""Round-11 ADVICE regression tests: the five reference-divergences
flagged by the advisor, each pinned here against the reference's
documented behavior (file:line cited per test)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.template import compile_template, parse_template


def render(spark, template, row=None, **kw):
    df = spark.createDataFrame([row or {"message": "x"}])
    return df.select(compile_template(template, df, **kw).alias("r")).first()["r"]


# --- 1. conf.templates threaded into exec-layer compiles ---------------


def test_conf_dynamic_template_fn(spark, tmp_path):
    """$(template ${var}) in a conf destination binds DYNAMICALLY
    against the config's template registry (tf-template.c dynamic
    path) instead of rendering the fallback/empty."""
    from syslog_ng_spark.config import run_conf

    src = tmp_path / "in.log"
    src.write_text("alpha\nbeta\n")
    out = tmp_path / "out"
    conf = f"""
template t_fmt {{ template("T:$MESSAGE"); }};
source s {{ file("{src}" flags(no-parse)); }};
destination d {{ file("{out}" template("$(template ${{which}} FB)\\n")); }};
log {{ source(s); rewrite {{ set("t_fmt" value("which")); }}; destination(d); }};
"""
    run_conf(spark, conf)
    lines = sorted(
        line
        for f in out.glob("part-*")
        for line in f.read_text().splitlines()
    )
    assert lines == ["T:alpha", "T:beta"]


def test_conf_static_template_fallback_form(spark, tmp_path):
    """Static KNOWN name with a fallback arg renders the template
    (tf-template.c: static binding wins; fallback args unused)."""
    from syslog_ng_spark.config import compile_conf, run_pipeline

    src = tmp_path / "in2.log"
    src.write_text("hi\n")
    out = tmp_path / "out2"
    conf = f"""
template t2 {{ template("S:$MESSAGE"); }};
source s {{ file("{src}" flags(no-parse)); }};
destination d {{ file("{out}" template("$(template t2 fallback)\\n")); }};
log {{ source(s); destination(d); }};
"""
    specs = compile_conf(conf)
    assert specs[0]["templates"] == {"t2": "S:$MESSAGE"}
    run_pipeline(spark, specs[0])
    lines = [ln for f in out.glob("part-*") for ln in f.read_text().splitlines()]
    assert lines == ["S:hi"]


# --- 2. '$(fn)@@' literal ordering --------------------------------------


def test_fn_msg_ref_literal_order():
    """parse_msg_ref (lib/template/compiler.c): the '@' collapsed from
    '@@' after a $(fn) renders AFTER the function output."""
    parts = parse_template("x$(echo a)@@y")
    kinds = [(p[0], p[1] if p[0] == "lit" else p[1]) for p in parts]
    assert kinds[0] == ("lit", "x")
    assert kinds[1][0] == "fn"
    assert kinds[2] == ("lit", "@y")


def test_fn_msg_ref_render_order(spark):
    assert render(spark, "x$(echo a)@@y") == "xa@y"
    # '@' + non-digit stays literal, after the element
    assert render(spark, "$(echo a)@z") == "a@z"


# --- 3. exact int64 $(/) ------------------------------------------------


def test_int_div_exact_beyond_double(spark):
    """tf_num_div does exact C int64 division; a double intermediate
    rounds 2^53+1 (numeric-funcs.c)."""
    assert render(spark, "$(/ 9007199254740993 1)") == "9007199254740993"
    assert render(spark, "$(/ 9007199254740993 3)") == "3002399751580331"
    # truncation toward zero unchanged
    assert render(spark, "$(/ -7 2)") == "-3"
    assert render(spark, "$(/ 19 0)") == "NaN"


# --- 4. named backreferences in match_store ------------------------------


def test_match_store_named_backref(spark):
    from syslog_ng_spark.operators.filters import match_store

    df = spark.createDataFrame(
        [("ab=ab ok",), ("ab=cd no",)], ["message"]
    )
    out = match_store(df, "message", r"(?P<tok>\w+)=(?P=tok)")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["sdata"]["tok"] == "ab"
    assert rows[0]["sdata"]["1"] == "ab"


def test_match_store_java_style_backref(spark):
    from syslog_ng_spark.operators.filters import match_store

    df = spark.createDataFrame([("xx=xx",)], ["message"])
    out = match_store(df, "message", r"(?<t>\w+)=\k<t>")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["sdata"]["t"] == "xx"


# --- 5. $(sanitize) GOption spellings ------------------------------------


@pytest.mark.parametrize(
    "tpl,expected",
    [
        ("$(sanitize --no-ctrl-chars alma\x1b_bela)", "alma\x1b_bela"),
        ("$(sanitize -C alma\x1b_bela)", "alma\x1b_bela"),
        ("$(sanitize --ctrl-chars alma\x1b_bela)", "alma__bela"),
        ("$(sanitize -c alma\x1b_bela)", "alma__bela"),
        # last flag wins (GOption writes one variable in argv order)
        ("$(sanitize -C -c alma\x1b_bela)", "alma__bela"),
        ("$(sanitize -c -C alma\x1b_bela)", "alma\x1b_bela"),
    ],
)
def test_sanitize_ctrl_flag_spellings(spark, tpl, expected):
    assert render(spark, tpl) == expected
