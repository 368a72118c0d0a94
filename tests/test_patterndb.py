"""patterndb @PARSER@ syntax tests.

Expectations modeled on the reference's radix tests
(modules/dbparser/tests/test_radix.c) — same pattern vocabulary,
same match/consumption semantics, exercised through the Spark
classifier instead of the radix trie walk.
"""

from __future__ import annotations

import re

import pytest

from syslog_ng_spark.operators.patterndb import (
    PatternCompileError,
    compile_pattern,
    load_patterndb_xml,
    patterndb_parse,
)


def match(pattern: str, text: str) -> dict | None:
    rx, fields = compile_pattern(pattern)
    m = re.match(rx, text)  # same prefix-anchored semantics as rlike('^...')
    if not m:
        return None
    return {f: m.group(i + 1) for i, f in enumerate(fields)}


# (pattern, text, expected fields or None) — the radix-test shapes
CASES = [
    ("a@NUMBER:szamx@aaa", "a15555aaa", {"szamx": "15555"}),
    ("a@NUMBER:szamx@aaa", "axaaa", None),
    ("a@@ab", "a@ab", {}),                        # @@ = literal @
    ("a@@@NUMBER:szam0@", "a@15555", {"szam0": "15555"}),
    ("@NUMBER:n@", "0xCAFE", {"n": "0xCAFE"}),    # hex (r_parser_number)
    ("@NUMBER:n@", "-42", {"n": "-42"}),
    ("@FLOAT:f@", "-42.75", {"f": "-42.75"}),
    ("val=@ESTRING:v:;@rest", "val=xyz;rest", {"v": "xyz"}),  # delim consumed
    ("val=@ESTRING:v:;@rest", "val=xyzrest", None),           # delim required
    ("val=@ESTRING:v:@", "val=everything after", {"v": "everything after"}),
    ("q=@QSTRING:q:\"@ end", 'q="hello world" end', {"q": "hello world"}),
    ("t=@QSTRING:t:<>@!", "t=<tag>!", {"t": "tag"}),
    ("u=@STRING:u@ x", "u=alnum123 x", {"u": "alnum123"}),
    ("s=@SET:s:abc@!", "s=cabba!", {"s": "cabba"}),
    ("s=@SET:s:abc@!", "s=!", None),              # SET needs >= 1 char
    ("s=@OPTIONALSET:s:abc@!", "s=!", {"s": ""}),  # OPTIONALSET may be empty
    ("ip=@IPv4:ip@ done", "ip=10.11.12.13 done", {"ip": "10.11.12.13"}),
    ("ip=@IPv4:ip@ done", "ip=256.11.12.13 done", None),  # octet validated
    ("mac=@MACADDR:m@.", "mac=00:1a:2b:3c:4d:5e.", {"m": "00:1a:2b:3c:4d:5e"}),
    ("m=@EMAIL:e@ .", "m=user.name@example.com .", {"e": "user.name@example.com"}),
    ("h=@HOSTNAME:h@ .", "h=db-01.prod.local .", {"h": "db-01.prod.local"}),
    ("p=@PCRE:p:[a-c]+x@ .", "p=abcx .", {"p": "abcx"}),
    ("rest: @ANYSTRING:a@", "rest: anything at all", {"a": "anything at all"}),
    ("prefix@NUMBER@", "prefix123 trailing ok", {}),  # prefix match, no capture
]


@pytest.mark.parametrize("pattern,text,expected", CASES)
def test_radix_style_patterns(pattern, text, expected):
    assert match(pattern, text) == expected


def test_compile_errors():
    for bad in ["x@ESTRING@", "x@QSTRING@", "x@SET@x", "x@PCRE@", "x@NOSUCH@", "x@NUMBER"]:
        with pytest.raises(PatternCompileError):
            compile_pattern(bad)


def test_load_patterndb_xml_order_and_classes():
    xml = """
    <patterndb version="4">
      <ruleset name="test" id="r1">
        <rules>
          <rule class="system" id="1">
            <patterns>
              <pattern>Accepted @ESTRING:method: @for @ESTRING:user: @</pattern>
              <pattern>Accepted @ANYSTRING:rest@</pattern>
            </patterns>
          </rule>
          <rule class="security" id="2">
            <patterns><pattern>Failed password for @ANYSTRING:user@</pattern></patterns>
          </rule>
        </rules>
      </ruleset>
    </patterndb>
    """
    rules = load_patterndb_xml(xml)
    assert [cls for cls, _ in rules] == ["system", "system", "security"]
    got = match(rules[0][1], "Accepted publickey for root from 10.0.0.1")
    assert got == {"method": "publickey", "user": "root"}


def test_patterndb_parse_first_match_and_fields(spark):
    df = spark.createDataFrame(
        [
            (1, "Accepted publickey for root from 10.0.0.1 port 22"),
            (2, "Failed password for invalid user admin"),
            (3, "something unrelated"),
        ],
        "id long, message string",
    )
    rules = [
        ("auth_ok", "Accepted @ESTRING:method: @for @ESTRING:user: @from @IPv4:ip@"),
        ("auth_fail", "Failed password for @ANYSTRING:who@"),
    ]
    rows = {
        r.id: r
        for r in patterndb_parse(df, "message", rules).orderBy("id").collect()
    }
    assert rows[1]["class"] == "auth_ok"
    assert rows[1].method == "publickey" and rows[1].user == "root" and rows[1].ip == "10.0.0.1"
    assert rows[2]["class"] == "auth_fail" and rows[2].who == "invalid user admin"
    assert rows[2].method == ""  # unbound fields render unset
    assert rows[3]["class"] == "unknown"


# ---------------------------------------------------------------------------
# property test: random literal/parser compositions must match a string
# constructed to fit them, extracting exactly the planted values
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

# each entry: (pattern fragment builder, sample value, regex-safe literal?)
_SEGMENTS = [
    ("@NUMBER:f{i}@", "4711"),
    ("@NUMBER:f{i}@", "-12"),
    ("@FLOAT:f{i}@", "3.25"),
    ("@IPv4:f{i}@", "192.168.1.45"),
    ("@MACADDR:f{i}@", "0a:1b:2c:3d:4e:5f"),
    ("@STRING:f{i}@", "word123"),
    ("@SET:f{i}:xyz@", "yzx"),
]
_LITERALS = ["alpha ", "beta=", " : ", "log[", "] ", "x@y "]


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(_LITERALS), st.sampled_from(_SEGMENTS)),
        min_size=1,
        max_size=5,
    )
)
def test_property_random_pattern_compositions(pieces):
    pattern_parts, text_parts, expected = [], [], {}
    for i, (lit, (frag, value)) in enumerate(pieces):
        # literal '@' must be doubled in the pattern text
        pattern_parts.append(lit.replace("@", "@@") + frag.format(i=i))
        text_parts.append(lit + value)
        expected[f"f{i}"] = value
        # separate adjacent parser segments so greedy runs can't merge
        pattern_parts.append(";")
        text_parts.append(";")
    pattern = "".join(pattern_parts)
    text = "".join(text_parts)
    assert match(pattern, text) == expected


def test_pcre_param_groups_do_not_shift_fields():
    got = match("p=@PCRE:p:(a|b)+x@ @NUMBER:n@", "p=abax 42")
    assert got == {"p": "abax", "n": "42"}
    # escaped parens stay literal
    got = match(r"q=@PCRE:q:\(x\)@!", "q=(x)!")
    assert got == {"q": "(x)"}
