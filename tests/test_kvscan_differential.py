"""Differential fuzz for the kv-scanner: a pure-Python MODEL of the
reference algorithm (written from kv-scanner.c's documented control
flow: _extract_key's backwards key walk, _skip_initial_spaces,
str-repr decode with the _match_delimiter callback, stray-word
encoding) checked against the Catalyst implementation over seeded
random inputs — one Spark job per config, hundreds of inputs each.
The ported criterion suite (test_kvscan_parity.py) arbitrates which
side is right when they disagree; this test exists to FIND such
disagreements in the input space the hand-written tables don't cover.
"""
from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from syslog_ng_spark.operators.kvscan import kv_scan_entries

KEYCHARS = set(string.ascii_letters + string.digits + "._-")
ESCAPES = {"b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t",
           "\\": "\\", '"': '"', "'": "'"}


def model_scan(text: str, kv_sep: str = "=", pair_sep: str = ", "):
    n = len(text)
    pairs: list[tuple[str, str]] = []

    def key_follows(i: int) -> bool:
        j = i
        while j < n and text[j] in KEYCHARS:
            j += 1
        k = j
        while k < n and text[k] == " ":
            k += 1
        return j > i and k < n and text[k] == kv_sep

    def match_delimiter(i: int, was_quoted: bool):
        """None = not a delimiter; else the position after it."""
        if i >= n:
            return i  # stop char (end of input)
        if not was_quoted and text[i] == " ":
            if pair_sep.startswith(" ") and text.startswith(pair_sep, i):
                return i + len(pair_sep)
            j = i
            while j < n and text[j] == " ":
                j += 1
            if j >= n or key_follows(j):
                return j
            if text.startswith(pair_sep, j):
                return j + len(pair_sep)
            return None
        if text[i] == " ":
            return i + 1  # quoted values: any space delimits
        if text.startswith(pair_sep, i):
            return i + len(pair_sep)
        return None

    def scan_unquoted(i: int):
        out = []
        j = i
        while j < n:
            d = match_delimiter(j, False)
            if d is not None:
                return "".join(out), d
            out.append(text[j])
            j += 1
        return "".join(out), n

    def decode_value(i: int):
        if i < n and text[i] in "'\"":
            q = text[i]
            j = i + 1
            out = []
            while j < n:
                c = text[j]
                if c == "\\" and j + 1 < n:
                    nxt = text[j + 1]
                    out.append(ESCAPES.get(nxt, "\\" + nxt))
                    j += 2
                    continue
                if c == q:
                    d = match_delimiter(j + 1, True)
                    if d is not None:
                        return "".join(out), d
                    break  # quotation error
                out.append(c)
                j += 1
            # unclosed / no delimiter after the close: raw literal scan
        return scan_unquoted(i)

    pos = 0
    while True:
        sep = text.find(kv_sep, pos)
        key = None
        while sep != -1:
            end_key = sep
            while end_key > pos and text[end_key - 1] == " ":
                end_key -= 1
            start_key = end_key
            while start_key > pos and text[start_key - 1] in KEYCHARS:
                start_key -= 1
            if end_key > start_key:
                key = text[start_key:end_key]
                pos = sep + 1
                break
            sep = text.find(kv_sep, sep + 1)
        if key is None:
            return pairs
        # _skip_initial_spaces
        while pos < n and text[pos] == " " and match_delimiter(pos, False) is None:
            pos += 1
        val, pos = decode_value(pos)
        pairs.append((key, val))


def _random_inputs(seed: int, count: int, kv_sep: str) -> list[str]:
    rng = random.Random(seed)
    atoms = [
        "k", "key1", "a-b", "x.y", "_z", "0", "*", "á", "@", "/",
        kv_sep, " ", "  ", ",", ", ", ";", "\t", "'", '"', "\\",
        "\\'", '\\"', "\\n", "v", "val", "some words", "'q v'",
        '"q v"', "''", '""', "'unclosed", '"half"x',
    ]
    return [
        "".join(rng.choice(atoms) for _ in range(rng.randint(0, 14)))
        for _ in range(count)
    ]


def _run_config(spark, kv_sep, pair_sep, seed):
    inputs = _random_inputs(seed, 400, kv_sep)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(inputs)], "i int, raw string"
    )
    rows = (
        df.select("i", kv_scan_entries("raw", kv_sep, pair_sep).alias("e"))
        .orderBy("i")
        .collect()
    )
    failures = []
    for row, text in zip(rows, inputs):
        got = [(e["key"], e["value"]) for e in row["e"]]
        want = model_scan(text, kv_sep, pair_sep)
        if got != want:
            failures.append(f"{text!r}: spark={got}, model={want}")
    assert not failures, (
        f"{len(failures)} disagreements (showing 10):\n"
        + "\n".join(failures[:10])
    )


def test_differential_default_config(spark):
    _run_config(spark, "=", ", ", seed=11)


def test_differential_colon_semicolon(spark):
    _run_config(spark, ":", ";", seed=12)


def test_differential_space_pair_sep(spark):
    _run_config(spark, "=", " ", seed=13)
