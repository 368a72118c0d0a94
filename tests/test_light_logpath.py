"""Ported end-to-end logpath scenarios from the reference's own
functional suite (tests/python_functional/functional_tests/logpath/
test_multiple_embedded_logpaths.py and test_multiple_flags.py):
EMBEDDED log {} paths inside one outer path, with per-inner-path
final/fallback flags, driven through whole configs source→destination
and asserted on rendered destination bytes. (Top-level final/fallback/
catchall algebra is already covered by tests/test_conflang.py — these
add the inner-logpath dimension those tests don't touch.)
"""
from __future__ import annotations

import pytest

# Oct 11 22:14:15 <host> <app>: message from <host> and <app>
LINES = [
    ("host-A", "app-A"),
    ("host-A", "app-B"),
    ("host-B", "app-A"),
    ("host-B", "app-B"),
]


def _write_input(tmp_path):
    src = tmp_path / "input.log"
    src.write_text(
        "".join(
            f"<38>Oct 11 22:14:15 {h} {p}: message from {h} and {p}\n"
            for h, p in LINES
        )
    )
    return src


def _read(dest_dir):
    return sorted(
        ln
        for f in dest_dir.glob("part-*")
        for ln in f.read_text().splitlines()
    )


def _msg(h, p):
    return f"{h}|{p}|message from {h} and {p}"


def test_multiple_embedded_logpaths(spark, tmp_path):
    """Reference test_multiple_embedded_logpaths: every inner path
    sees the outer source's messages independently (fan-out), and a
    top-level path with no source gets nothing."""
    from syslog_ng_spark.config import run_conf

    src = _write_input(tmp_path)
    d = {i: tmp_path / f"out{i}" for i in (1, 2, 3)}
    conf = f"""
source s {{ file("{src}"); }};
destination d1 {{ file("{d[1]}" template("$HOST|$PROGRAM|$MESSAGE\\n")); }};
destination d2 {{ file("{d[2]}" template("$HOST|$PROGRAM|$MESSAGE\\n")); }};
destination d3 {{ file("{d[3]}" template("$HOST|$PROGRAM|$MESSAGE\\n")); }};
log {{
    source(s);
    log {{ filter {{ host("host-A"); }}; destination(d1); }};
    log {{ filter {{ program("app-A"); }}; destination(d2); }};
    log {{ destination(d3); }};
}};
"""
    run_conf(spark, conf)
    assert _read(d[1]) == sorted([_msg("host-A", "app-A"), _msg("host-A", "app-B")])
    assert _read(d[2]) == sorted([_msg("host-A", "app-A"), _msg("host-B", "app-A")])
    assert _read(d[3]) == sorted(_msg(h, p) for h, p in LINES)


def test_sourceless_toplevel_path_gets_nothing(spark, tmp_path):
    """'log { destination(d4); };' without source() or catch-all is
    valid and receives no messages (the reference scenario's d4)."""
    from syslog_ng_spark.config import compile_conf

    conf = """
destination d4 { file("/tmp/never" template("$MESSAGE\\n")); };
log { destination(d4); };
"""
    assert compile_conf(conf) == []


def test_multiple_flags_inner_final_and_fallback(spark, tmp_path):
    """Reference test_multiple_flags: inner flags(final) hides its
    matches from LATER inner paths; inner flags(fallback) sees only
    messages no earlier inner path matched; the catch-all path still
    sees everything."""
    from syslog_ng_spark.config import run_conf

    src = _write_input(tmp_path)
    d = {i: tmp_path / f"out{i}" for i in (1, 2, 3, 4)}
    conf = f"""
source s {{ file("{src}"); }};
destination d1 {{ file("{d[1]}" template("$HOST|$PROGRAM|$MESSAGE\\n")); }};
destination d2 {{ file("{d[2]}" template("$HOST|$PROGRAM|$MESSAGE\\n")); }};
destination d3 {{ file("{d[3]}" template("$HOST|$PROGRAM|$MESSAGE\\n")); }};
destination d4 {{ file("{d[4]}" template("$HOST|$PROGRAM|$MESSAGE\\n")); }};
log {{
    source(s);
    log {{ filter {{ host("host-A"); }}; destination(d1); flags(final); }};
    log {{ filter {{ program("app-A"); }}; destination(d2); }};
    log {{ destination(d3); flags(fallback); }};
}};
log {{ destination(d4); flags(catchall); }};
"""
    run_conf(spark, conf)
    # host-A matches go to d1 and, being final, skip d2/d3
    assert _read(d[1]) == sorted([_msg("host-A", "app-A"), _msg("host-A", "app-B")])
    # program app-A minus what final consumed → only host-B app-A
    assert _read(d[2]) == [_msg("host-B", "app-A")]
    # fallback: matched by NO earlier inner path → host-B app-B
    assert _read(d[3]) == [_msg("host-B", "app-B")]
    # catch-all sees all four
    assert _read(d[4]) == sorted(_msg(h, p) for h, p in LINES)
