"""Rewrite rules.

Reference: lib/rewrite/* — set(), subst(), unset(), set-tag(),
clear-tag(), groupset(), set-severity(), set-facility(), set-pri().
Each is a narrow DataFrame transformation; conditions (`condition()`
option on rewrite rules) map to `F.when(cond, new).otherwise(old)`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from syslog_ng_spark.datamodel import FACILITY_NAMES, SEVERITY_NAMES


def set_field(df: DataFrame, field: str, value: Column, condition: Column | None = None) -> DataFrame:
    """set('value', value(field)) (reference: lib/rewrite/rewrite-set.c)."""
    if condition is not None and field in df.columns:
        value = F.when(condition, value).otherwise(F.col(field))
    return df.withColumn(field, value)


def subst(
    df: DataFrame,
    field: str,
    pattern: str,
    replacement: str,
    condition: Column | None = None,
) -> DataFrame:
    """subst(pattern, replacement, value(field), flags(global))
    (reference: lib/rewrite/rewrite-subst.c). Spark's regexp_replace is
    global like the reference's flags(global)."""
    new = F.regexp_replace(F.col(field), pattern, replacement)
    if condition is not None:
        new = F.when(condition, new).otherwise(F.col(field))
    return df.withColumn(field, new)


def unset(df: DataFrame, *fields: str) -> DataFrame:
    """unset(value(field)) (lib/rewrite/rewrite-unset.c)."""
    return df.drop(*fields)


def unset_map_keys(df: DataFrame, map_field: str, *keys: str) -> DataFrame:
    """groupunset() on NV-pair maps — remove keys from a map column."""
    key_arr = F.array(*[F.lit(k) for k in keys])
    return df.withColumn(
        map_field, F.map_filter(F.col(map_field), lambda k, _: ~F.array_contains(key_arr, k))
    )


def set_tag(df: DataFrame, tag: str, tags_field: str = "tags") -> DataFrame:
    """set-tag() (lib/rewrite/rewrite-set-tag.c); idempotent like the ref."""
    return df.withColumn(tags_field, F.array_union(F.col(tags_field), F.array(F.lit(tag))))


def clear_tag(df: DataFrame, tag: str, tags_field: str = "tags") -> DataFrame:
    return df.withColumn(tags_field, F.array_remove(F.col(tags_field), tag))


def groupset(
    df: DataFrame, map_field: str, fn: Callable[[Column, Column], Column]
) -> DataFrame:
    """groupset() (lib/rewrite/rewrite-groupset.c) — apply a transform to
    every value of an NV-pair map; fn(key, value) -> new value."""
    return df.withColumn(map_field, F.transform_values(F.col(map_field), fn))


def set_severity(df: DataFrame, level: int | str, condition: Column | None = None) -> DataFrame:
    """set-severity() (lib/rewrite/rewrite-set-severity.c)."""
    n = level if isinstance(level, int) else SEVERITY_NAMES.index(level)
    return set_field(df, "severity", F.lit(n).cast("int"), condition)


def set_facility(df: DataFrame, fac: int | str, condition: Column | None = None) -> DataFrame:
    n = fac if isinstance(fac, int) else FACILITY_NAMES.index(fac)
    return set_field(df, "facility", F.lit(n).cast("int"), condition)


def map_value_pairs(df: DataFrame, map_field: str, key_map: dict[str, str]) -> DataFrame:
    """map-value-pairs() (modules/map-value-pairs) — rename keys of an
    NV-pair map."""
    mapping = F.create_map(*[F.lit(x) for kv in key_map.items() for x in kv])
    return df.withColumn(
        map_field,
        F.transform_keys(F.col(map_field), lambda k, _: F.coalesce(mapping[k], k)),
    )


def fix_timezone(df: DataFrame, tz: str, ts_col: str = "ts") -> DataFrame:
    """fix-timezone(): the timestamp was PARSED in the wrong zone —
    reinterpret the wall-clock reading as `tz` local time (reference:
    modules/timestamp/rewrite-fix-timezone.c). Spark stores UTC
    instants, so this is to_utc_timestamp over the naive reading."""
    return df.withColumn(ts_col, F.to_utc_timestamp(F.col(ts_col), tz))


def set_timezone(df: DataFrame, tz: str, ts_col: str = "ts", target: str = "ts_local") -> DataFrame:
    """set-timezone(): render the instant in another zone for display
    grouping (reference: modules/timestamp/rewrite-set-timezone.c);
    the instant itself is unchanged."""
    return df.withColumn(target, F.from_utc_timestamp(F.col(ts_col), tz))
