"""patterndb ``<actions>`` — synthetic messages on match / timeout.

Reference: modules/dbparser/pdb-action.c (trigger/condition/rate),
modules/dbparser/synthetic-message.c (inherit modes, value/tag
application), trigger plumbing modules/dbparser/patterndb.c:257-400,
ruleset XML shape modules/dbparser/tests/test_patterndb.h, behavior
tests modules/dbparser/tests/test_patterndb.c.

A rule may carry actions that *emit new messages*:
- ``trigger='match'``: one synthetic message per matching input
  message (the reference fires it as the message is processed);
- ``trigger='timeout'``: one synthetic message when the rule's
  correlation context expires (timer wheel in the reference; in batch
  a context is a session, and every session eventually expires, so
  this is one row per session).

Spark shape: classification is the same first-match CASE chain as
operators/patterndb.py; match actions are a filter + template-rendered
projection; timeout actions are sessionize() + groupBy (one shuffle on
the correlation key) with the last message riding the aggregation as
max_by(struct) — all JVM-side, no UDFs, oracle-reproducible.

Semantics preserved from the reference:
- inherit-properties none → fresh message carrying only the
  triggering message's timestamp (synthetic-message.c
  _generate_new_message_with_timestamp_of_the_triggering_message);
  'TRUE'/last-message → clone of the triggering / context's last
  message; 'context' → clone of the last message + merge of *unset*
  NVs from earlier context messages — with a flat column schema every
  core field is set, so it equals last-message here (documented
  deviation: sdata-map union merge is not performed).
- condition: template comparison ('"${PID}" ne "123"') or a
  message()/program()/host() regex filter, evaluated per candidate
  (patterndb.c _is_action_triggered).
- rate='N/T': at most N emissions per rule+action+context-key per T
  seconds. The reference uses a token bucket on arrival time; the
  batch analog admits the first N per aligned T-second window (same
  steady-state rate; burst shape differs — documented deviation,
  matching rate_limit_batch).
- timestamps: synthetic messages carry the triggering message's
  timestamp in every inherit mode; for timeout triggers the
  triggering message is the context's LAST message
  (patterndb.c _generate_default_message_from_context).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from syslog_ng_spark.operators.patterndb import compile_pattern
from syslog_ng_spark.template import TemplateCompiler, schema_resolver
from syslog_ng_spark.util import epoch_seconds

# reference macro name -> canonical log schema column
_MACRO_COLS = {
    "MESSAGE": "message",
    "MSG": "message",
    "HOST": "host",
    "PROGRAM": "program",
    "PID": "pid",
}


@dataclass
class SyntheticMessage:
    """<message> block: templated values + tags + inherit mode
    (synthetic-message.h SyntheticMessage)."""

    values: dict[str, str] = field(default_factory=dict)
    tags: list[str] = field(default_factory=list)
    inherit: str = "none"  # none | last-message | context


@dataclass
class PdbAction:
    """<action> block (pdb-action.h PDBAction)."""

    message: SyntheticMessage
    trigger: str = "match"  # match | timeout
    condition: str | None = None
    rate: tuple[int, int] | None = None  # (N, per-seconds)


@dataclass
class PdbRule:
    """<rule> with correlation attributes + actions (pdb-rule.h)."""

    rule_id: str
    cls: str
    patterns: list[str]
    context_id: str | None = None  # template
    context_timeout: int = 60
    context_scope: str = "program"  # process|program|host|global
    actions: list[PdbAction] = field(default_factory=list)


def _parse_message(el: ET.Element) -> SyntheticMessage:
    values = {}
    for v in el.iter("value"):
        values[v.get("name")] = v.text or ""
    tags = [t.text for t in el.iter("tag") if t.text]
    inherit = el.get("inherit-properties") or el.get("inherit-mode") or "none"
    if inherit.lower() in ("true", "1", "yes"):
        inherit = "last-message"
    elif inherit.lower() in ("false", "0", "no"):
        inherit = "none"
    return SyntheticMessage(values=values, tags=tags, inherit=inherit)


def load_patterndb_rules(xml_text: str) -> list[PdbRule]:
    """Full-shape ruleset loader: patterns + correlation attributes +
    <actions> (pdb-load.c element handlers). Order preserved (first
    match wins, like the radix walk)."""
    root = ET.fromstring(xml_text)
    rules: list[PdbRule] = []
    for rule in root.iter("rule"):
        actions = []
        for act in rule.iter("action"):
            msg_el = act.find("message")
            if msg_el is None:  # create-context actions: not supported
                continue
            rate = None
            if act.get("rate"):
                n, per = act.get("rate").split("/", 1)
                rate = (int(n), int(per))
            actions.append(
                PdbAction(
                    message=_parse_message(msg_el),
                    trigger=act.get("trigger") or "match",
                    condition=act.get("condition"),
                    rate=rate,
                )
            )
        patterns = [
            p.text
            for pats in rule.findall("patterns")
            for p in pats.findall("pattern")
            if p.text
        ]
        rules.append(
            PdbRule(
                rule_id=rule.get("id") or "",
                cls=rule.get("class") or "unknown",
                patterns=patterns,
                context_id=rule.get("context-id"),
                context_timeout=int(rule.get("context-timeout") or 60),
                context_scope=rule.get("context-scope") or "program",
                actions=actions,
            )
        )
    return rules


_FILTER_COND = re.compile(r"^\s*(message|program|host)\(\"((?:[^\"\\]|\\.)*)\"[^)]*\)\s*$")


def compile_condition(cond: str, df: DataFrame) -> Column:
    """Action condition → boolean Column. Two grammars (the subset the
    reference's tests exercise): a template comparison
    ('"${PID}" ne "123"', filter-cmp.c operators via the template
    compiler's $(if) condition parser) or a single field regex filter
    ('message("pat" type(pcre))', filter-re.c)."""
    m = _FILTER_COND.match(cond)
    if m:
        colname, pattern = m.group(1), m.group(2).replace('\\"', '"')
        return F.col(_MACRO_COLS.get(colname.upper(), colname)).rlike(pattern)
    return TemplateCompiler(schema_resolver(df.columns))._cond(cond)


def _scope_cols(scope: str, df: DataFrame) -> list[str]:
    """context-scope -> grouping columns (correlation-key.c:
    process ⊃ program ⊃ host ⊃ global)."""
    cols = {
        "process": ["host", "program", "pid"],
        "program": ["host", "program"],
        "host": ["host"],
        "global": [],
    }[scope]
    return [c for c in cols if c in df.columns]


def _rewrite_context_funcs(template: str) -> str:
    """$(context-length) etc. → ${CONTEXT_*} column refs — the batch
    context aggregates are precomputed columns here, where the
    reference evaluates context-funcs.c over the live context."""
    return template.replace("$(context-length)", "${CONTEXT_LENGTH}")


def _render(
    base: DataFrame,
    action: PdbAction,
    out_columns: list[str],
    extra_values: list[str],
    inherit_from_row: bool,
    ts_col: str,
) -> DataFrame:
    """Project a candidate DataFrame into synthetic rows with the
    union output schema (input columns + extra value columns +
    tags/synthetic markers)."""
    compiler = TemplateCompiler(schema_resolver(base.columns))
    rendered: dict[str, Column] = {}
    for name, tmpl in action.message.values.items():
        target = _MACRO_COLS.get(name, name)
        rendered[target] = compiler.compile(_rewrite_context_funcs(tmpl))

    cols = []
    base_types = dict(base.dtypes)
    for c in out_columns:
        if c in rendered:
            col = rendered[c]
            if c in base_types and base_types[c] != "string":
                col = col.try_cast(base_types[c])
            cols.append(col.alias(c))
        elif c == ts_col:
            cols.append(F.col(ts_col).alias(c))  # triggering msg's stamp
        elif c in base.columns and (inherit_from_row or c in ("CONTEXT_ID",)):
            cols.append(F.col(c).alias(c))
        elif c in extra_values:
            cols.append(F.lit("").alias(c))
        elif c in base.columns:
            # inherit none: unset (logmsg default '' for strings,
            # NULL otherwise)
            if base_types[c] == "string":
                cols.append(F.lit("").alias(c))
            else:
                cols.append(F.lit(None).cast(base_types[c]).alias(c))
        else:
            cols.append(F.lit("").alias(c))
    cols.append(F.array(*[F.lit(t) for t in action.message.tags]).alias("synthetic_tags"))
    return base.select(*cols)


def _rate_limit(cand: DataFrame, action: PdbAction, key: list[str], ts_col: str) -> DataFrame:
    if action.rate is None:
        return cand
    n, per = action.rate
    bucket = F.floor(epoch_seconds(F.col(ts_col)) / per)
    w = Window.partitionBy(*(key or [F.lit(1)]), bucket).orderBy(F.col(ts_col))
    return cand.withColumn("_rl", F.row_number().over(w)).where(F.col("_rl") <= n).drop("_rl")


def patterndb_actions(
    df: DataFrame,
    rules: list[PdbRule],
    msg_col: str = "message",
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Synthetic messages emitted by every rule's actions.

    Output schema: input columns ∪ extra value-name columns, plus
    `rule_id` (emitting rule), `trigger`, and `synthetic_tags`. Use
    `apply_actions` to union these back into the stream (the
    reference's _emit_message path feeds them to the same log paths).

    Plan shape: ONE first-match classification pass over the input
    (shared CASE chain), then per match-action a filter+project (no
    shuffle), per timeout-action one sessionize+groupBy shuffle keyed
    by the correlation key — the same key the reference's timer wheel
    hashes on, so it parallelizes at 100 TB and AQE splits skewed
    keys."""
    from syslog_ng_spark.operators.correlate import sessionize

    compiled = {r.rule_id: [compile_pattern(p) for p in r.patterns] for r in rules}

    # first-match rule classification (radix order)
    cls_expr = None
    for r in rules:
        cond = None
        for rx, _ in compiled[r.rule_id]:
            c = F.col(msg_col).rlike(rx)
            cond = c if cond is None else (cond | c)
        if cond is None:
            continue
        cls_expr = (
            F.when(cond, F.lit(r.rule_id))
            if cls_expr is None
            else cls_expr.when(cond, F.lit(r.rule_id))
        )
    if cls_expr is None:
        raise ValueError("no patterns in ruleset")
    tagged = df.withColumn("_rule", cls_expr.otherwise(F.lit("")))

    extra_values = []
    for r in rules:
        for a in r.actions:
            for name in a.message.values:
                target = _MACRO_COLS.get(name, name)
                if target not in df.columns and target not in extra_values:
                    extra_values.append(target)
    out_columns = list(df.columns) + extra_values

    outs: list[DataFrame] = []
    for r in rules:
        matched = tagged.where(F.col("_rule") == r.rule_id)
        # typed field capture (radix.c parser fields) so action
        # templates can reference ${field} from @PARSER:field@
        for rx, fs in compiled[r.rule_id]:
            for name in fs:
                if name in matched.columns:
                    continue
                val = F.when(F.col(msg_col).rlike(rx), F.regexp_extract(F.col(msg_col), rx, fs.index(name) + 1)).otherwise(F.lit(""))
                matched = matched.withColumn(name, val)
        scope = _scope_cols(r.context_scope, df)
        if r.context_id is not None:
            # resolve against the matched frame so the context-id
            # template can reference captured fields (${uid} etc.)
            ctx_id = TemplateCompiler(schema_resolver(matched.columns)).compile(r.context_id)
            matched = matched.withColumn("CONTEXT_ID", ctx_id)
            ctx_key = scope + ["CONTEXT_ID"]
        else:
            ctx_key = scope

        for a in r.actions:
            if a.trigger == "match":
                cand = matched
                if r.context_id is not None:
                    # $(context-length) at match time = messages so
                    # far in this context, including this one
                    sess = sessionize(
                        matched, ctx_key, ts=ts_col, timeout=r.context_timeout,
                        order_tiebreak=order_tiebreak,
                    )
                    w = (
                        Window.partitionBy(*ctx_key, "session_id")
                        .orderBy(*([F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])))
                        .rowsBetween(Window.unboundedPreceding, 0)
                    )
                    cand = sess.withColumn(
                        "CONTEXT_LENGTH", F.count(F.lit(1)).over(w).cast("string")
                    )
                else:
                    cand = cand.withColumn("CONTEXT_LENGTH", F.lit("1"))
                if a.condition:
                    cand = cand.where(compile_condition(a.condition, cand))
                cand = _rate_limit(cand, a, ctx_key, ts_col)
                inherit = a.message.inherit != "none"
                rendered = _render(cand, a, out_columns, extra_values, inherit, ts_col)
            elif a.trigger == "timeout":
                if r.context_id is None:
                    continue  # timeout needs a correlation context
                sess = sessionize(
                    matched, ctx_key, ts=ts_col, timeout=r.context_timeout,
                    order_tiebreak=order_tiebreak,
                )
                # the context's last message rides the agg as
                # max_by(struct(cols), (ts, tiebreak)) — one shuffle
                ordcol = (
                    F.struct(F.col(ts_col), F.col(order_tiebreak))
                    if order_tiebreak
                    else F.col(ts_col)
                )
                # keep capture columns so timeout templates can
                # reference ${field}; CONTEXT_ID comes from the key
                keep = [c for c in matched.columns if c not in ("_rule", "CONTEXT_ID")]
                last = F.max_by(F.struct(*[F.col(c) for c in keep]), ordcol)
                cand = (
                    sess.groupBy(*ctx_key, "session_id")
                    .agg(
                        last.alias("_last"),
                        F.count(F.lit(1)).cast("string").alias("CONTEXT_LENGTH"),
                    )
                    .select(
                        *[F.col(f"_last.{c}").alias(c) for c in keep],
                        F.col("CONTEXT_ID"),
                        F.col("CONTEXT_LENGTH"),
                    )
                )
                if a.condition:
                    cand = cand.where(compile_condition(a.condition, cand))
                cand = _rate_limit(cand, a, ctx_key, ts_col)
                inherit = a.message.inherit != "none"
                rendered = _render(cand, a, out_columns, extra_values, inherit, ts_col)
            else:
                raise ValueError(f"unknown trigger {a.trigger!r}")
            rendered = rendered.withColumn("rule_id", F.lit(r.rule_id)).withColumn(
                "trigger", F.lit(a.trigger)
            )
            outs.append(rendered)

    if not outs:
        raise ValueError("ruleset has no supported actions")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def apply_actions(
    df: DataFrame,
    rules: list[PdbRule],
    msg_col: str = "message",
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Original stream ∪ synthetic messages (the reference emits both
    through the same log paths). Originals carry synthetic=false and
    '' for the extra value columns (logmsg unset semantics)."""
    synth = patterndb_actions(df, rules, msg_col, ts_col, order_tiebreak)
    extra = [c for c in synth.columns if c not in df.columns]
    orig = df
    for c in extra:
        if c == "synthetic_tags":
            orig = orig.withColumn(c, F.array().cast("array<string>"))
        else:
            orig = orig.withColumn(c, F.lit(""))
    return (
        orig.withColumn("synthetic", F.lit(False))
        .unionByName(synth.withColumn("synthetic", F.lit(True)))
    )
