"""Per-delivery message state: $SEQNUM / $RCPTID assignment.

Reference: lib/seqnum.h (init_sequence_number starts at 1,
step_sequence_number increments per delivered message and wraps the
gint32 back to 1), lib/logwriter.c:1209 (each destination writer steps
its OWN counter per message written), lib/logmsg/logmsg.c:1150 +
lib/rcptid.c (RCPTID: a global uint64 starting at 1, assigned once at
RECEPTION when use-uniqid(yes) is set, 0 = unset).

Spark mapping — gapless numbering WITHOUT a global shuffle:
``monotonically_increasing_id`` encodes ``partition_id << 33 |
row_in_partition``; one tiny aggregate (a single count row per
partition reaches the driver) turns per-partition counts into
cumulative offsets, and ``offset[pid] + row_in_partition`` numbers the
frame gaplessly in physical order. That is exactly the daemon's
delivery order semantics: arrival order, not a semantic sort. For
reproducible numbering (tests, oracles, replayable pipelines) pass
``order_by``: the frame is range-repartitioned and sorted on the key
first, so the same two-pass offset trick yields a deterministic global
row_number — still no single-partition window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# monotonically_increasing_id layout (MonotonicallyIncreasingID):
# upper 31 bits partition id, lower 33 bits record number
_MID_ROW_MASK = (1 << 33) - 1

_SEQNUM_WRAP = 2147483647  # gint32 wrap: 1..2^31-1 then back to 1


def _partition_offsets(
    df: DataFrame, start: int
) -> tuple[list[int], list[int], int]:
    """Cumulative start offset + row count per partition id, plus the
    total. One job; only one (pid, count) row per partition reaches
    the driver — safe at any scale. The caller MUST pass a persisted
    frame: the cache pins the physical row→partition layout, so the
    counting pass and the consuming pass read the same frozen blocks
    (r11's element_at OOB came from AQE coalescing the two passes
    differently; before r12 a full-width first(struct(*)) probe forced
    identical coalescing — the persist replaces it and also defends
    against nondeterministic upstreams: round-robin repartition,
    shuffle fetch retries, recomputation after executor loss)."""
    counts = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("count"))
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    max_pid = max(by_pid) if by_pid else -1
    offsets, per_pid, acc = [], [], start
    for pid in range(max_pid + 1):
        offsets.append(acc)
        per_pid.append(by_pid.get(pid, 0))
        acc += by_pid.get(pid, 0)
    return offsets, per_pid, acc - start


def _monotone_surrogate(df: DataFrame, col: Column) -> Column:
    """A double that ORDERS like `col` (ties may collapse — tie rows
    just share a bucket and the in-bucket sort separates them).
    Branches on the resolved dtype (r12, ADVICE): a blanket
    try_cast('double') gave numeric-LOOKING strings numeric
    surrogates ('10'→10.0 > '9'→9.0) while Spark sorts them
    lexicographically ('10' < '9'), contradicting the in-bucket
    orderBy. Numerics/booleans cast; timestamps/dates go through
    epoch seconds; strings/binary take their first 8 bytes
    RIGHT-PADDED to 8 as a big-endian integer (padding matters:
    unpadded, 'b'=0x62 < 'aa'=0x6161 inverted the string order)."""
    from pyspark.sql import types as T

    dt = df.select(col.alias("_k")).schema[0].dataType
    if isinstance(dt, (T.NumericType, T.BooleanType)):
        return F.coalesce(col.cast("double"), F.lit(0.0))
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return F.coalesce(col.cast("timestamp").cast("double"), F.lit(0.0))
    if isinstance(dt, T.BinaryType):
        # raw bytes directly — a cast through string would mangle
        # non-UTF-8 payloads
        raw = col
    else:
        raw = col.cast("string").cast("binary")
    prefix = F.rpad(F.hex(F.substring(raw, 1, 8)), 16, "0")
    return F.coalesce(F.conv(prefix, 16, 10).cast("double"), F.lit(0.0))


def _deterministic_numbered(
    df: DataFrame, target: str, start: int, keys: list, wrap: int | None
) -> tuple[DataFrame, int]:
    """Deterministic global row_number over `keys`, scalable: NO
    physical-partition-id dependence (range/round-robin layouts vary
    per query — sampling seeds and AQE coalescing are both
    query-local, measured in r11) and no single-partition Window.
    Shape: quantile boundaries over a monotone double surrogate of
    the first key (collected once) bucket the frame; one tiny
    count-per-bucket aggregate becomes driver-side offsets; a
    Window PER BUCKET orders by the full key list. Buckets are a
    deterministic function of the DATA, so every pass agrees. Skewed
    first keys shrink to fewer effective buckets — the window
    partition is then bounded by that key's frequency."""
    from pyspark.sql import Window

    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    nb = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    surr = _monotone_surrogate(df, cols[0])
    probs = [i / nb for i in range(1, nb)]
    with_surr = df.withColumn("_surr", surr)
    bounds = sorted(
        set(with_surr.stat.approxQuantile("_surr", probs, 0.001))
    ) if probs else []
    if probs and len(bounds) <= 1:
        # constant-8-byte-prefix pathology (r12): string keys sharing a
        # long common prefix (a fixed URL root, a log-path stem) all
        # collapse to ONE surrogate value → one bucket → one window
        # partition. Fallback: find the population's common prefix
        # (one tiny min/max aggregate) and take the 8 bytes AFTER it —
        # the common prefix contributes nothing to the order, so the
        # offset surrogate is still monotone over this population.
        # Lazy: the extra scan only happens when the first attempt
        # actually collapsed.
        from pyspark.sql import types as T

        dt = df.select(cols[0].alias("_k")).schema[0].dataType
        if isinstance(dt, T.StringType):
            mn, mx = df.agg(F.min(cols[0]), F.max(cols[0])).head()
            if mn is not None and mx is not None:
                cp = 0
                for a, b in zip(str(mn), str(mx)):
                    if a != b:
                        break
                    cp += 1
                if cp > 0:
                    surr = _monotone_surrogate(
                        df, F.substring(cols[0], cp + 1, 1 << 20))
                    with_surr = df.withColumn("_surr", surr)
                    bounds = sorted(set(
                        with_surr.stat.approxQuantile("_surr", probs, 0.001)))
    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.size(F.filter(barr, lambda b: b < F.col("_surr")))
    else:
        bucket = F.lit(0)
    bucketed = with_surr.withColumn("_bucket", bucket)
    counts = bucketed.groupBy("_bucket").count().collect()
    by_b = {r["_bucket"]: r["count"] for r in counts}
    max_b = max(by_b) if by_b else -1
    offsets, acc = [], start
    for b in range(max_b + 1):
        offsets.append(acc)
        acc += by_b.get(b, 0)
    total = acc - start
    if not offsets:
        return df.withColumn(target, F.lit(start).cast("long")), 0
    off_arr = F.array(*[F.lit(o) for o in offsets])
    w = Window.partitionBy("_bucket").orderBy(*cols)
    num = F.element_at(off_arr, F.col("_bucket") + 1) + F.row_number().over(w) - 1
    if wrap is not None:
        num = ((num - 1) % F.lit(wrap)) + 1
    return (
        bucketed.withColumn(target, num.cast("long")).drop("_surr", "_bucket"),
        total,
    )


def _numbered(
    df: DataFrame,
    target: str,
    start: int,
    order_by,
    wrap: int | None,
) -> tuple[DataFrame, int]:
    if order_by is not None:
        keys = order_by if isinstance(order_by, (list, tuple)) else [order_by]
        return _deterministic_numbered(df, target, start, list(keys), wrap)
    # Persist BEFORE counting (r12): the cache materializes during the
    # counting job and freezes the row→partition layout, so the
    # consuming job reads the identical blocks — no probe struct, no
    # AQE-coalescing divergence, and nondeterministic upstreams
    # (round-robin repartition, fetch retries, executor-loss
    # recompute) cannot shift rows between the two passes.
    # MEMORY_AND_DISK: spills instead of recomputing at scale. The
    # caller may release it after materializing via
    # release_numbering_cache(returned_df).
    from pyspark import StorageLevel

    cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    offsets, per_pid, total = _partition_offsets(cached, start)
    if not offsets:
        out = cached.withColumn(target, F.lit(start).cast("long"))
        out._seqnum_cache = cached
        return out, 0
    mid = F.monotonically_increasing_id()
    pid = F.shiftright(mid, 33).cast("int")
    row_in_part = mid.bitwiseAND(F.lit(_MID_ROW_MASK))
    offset_arr = F.array(*[F.lit(o) for o in offsets])
    count_arr = F.array(*[F.lit(c) for c in per_pid])
    # Loud backstop (ADVICE r12): if the layout drifted anyway, fail
    # the job instead of silently duplicating/skipping seqnums or
    # emitting NULL from an out-of-range element_at.
    drift_check = F.assert_true(
        (pid >= 0) & (pid < F.lit(len(offsets)))
        & (row_in_part < F.element_at(count_arr, pid + 1)),
        F.lit("seqnum layout drift: numbering pass saw a (partition,row) "
              "outside the counted layout — upstream frame changed between "
              "the counting and consuming jobs"),
    )
    num = F.element_at(offset_arr, pid + 1) + row_in_part
    if wrap is not None:
        num = ((num - 1) % F.lit(wrap)) + 1
    num = F.when(drift_check.isNull(), num)
    out = cached.withColumn(target, num.cast("long"))
    out._seqnum_cache = cached
    return out, total


def release_numbering_cache(df: DataFrame) -> None:
    """Unpersist the layout-pinning cache attached by delivery-order
    numbering, once the caller has materialized every consumer of the
    numbered frame (e.g. a destination writer after its write). No-op
    for frames that carry no cache (deterministic order_by path,
    already-numbered frames)."""
    cached = getattr(df, "_seqnum_cache", None)
    if cached is not None:
        cached.unpersist()


def numbered_in_order(
    df: DataFrame,
    target: str,
    start: int = 1,
    order_by: str | Column | list | None = None,
) -> DataFrame:
    """Add a gapless ``start``-based long column ``target`` numbering
    every row. Default: physical (delivery) order, zero shuffle. With
    ``order_by``: deterministic global order via repartitionByRange +
    sortWithinPartitions — scalable, no single-partition Window.

    The per-partition counting pass and the numbering pass must see
    the same partition layout: the frame is persisted
    (MEMORY_AND_DISK) before the count so both passes read the same
    frozen cache blocks, and an assert_true backstop fails the job
    loudly if a row lands outside the counted layout. Call
    release_numbering_cache(result) after materializing to drop the
    pin."""
    return _numbered(df, target, start, order_by, wrap=None)[0]


def assign_seqnum(
    df: DataFrame,
    target: str = "seqnum",
    start: int = 1,
    order_by: str | Column | list | None = None,
) -> DataFrame:
    """$SEQNUM: the destination writer's per-delivery counter
    (lib/logwriter.c seq_num). Call at the destination, on the frame
    being written, so the numbering reflects what THIS writer
    delivers — a second destination numbers independently, exactly
    like each LogWriter owning its own counter. Wraps like the
    reference's gint32 (step_sequence_number: overflow resets to 1)."""
    return _numbered(df, target, start, order_by, wrap=_SEQNUM_WRAP)[0]


def assign_rcptid(
    df: DataFrame,
    target: str = "rcptid",
    start: int = 1,
    order_by: str | Column | list | None = None,
) -> DataFrame:
    """$RCPTID: the reception id (use-uniqid(yes)): a unique
    monotonically increasing uint64 per ingested message, assigned at
    the SOURCE — call right after the source read so every downstream
    step and destination sees the same id for the same message.
    ``start`` carries the persisted next.rcptid across incremental
    runs (lib/rcptid.c persist-state)."""
    return numbered_in_order(df, target, start=start, order_by=order_by)


def assign_rcptid_counted(
    df: DataFrame,
    target: str = "rcptid",
    start: int = 1,
) -> tuple[DataFrame, int]:
    """assign_rcptid + the number of rows numbered — the daemon-mode
    building block: run_conf_stream numbers each micro-batch's raw
    source frame at reception and advances a PERSISTED next-rcptid by
    the returned count (lib/rcptid.c keeps the counter in
    persist-state across daemon restarts)."""
    return _numbered(df, target, start, None, wrap=None)


def ensure_seqnum(
    df: DataFrame,
    *template_strs: str | None,
    templates: dict | None = None,
    start: int = 1,
) -> DataFrame:
    """Destination-writer hook: if any of the given template strings
    references $SEQNUM and the frame doesn't carry a ``seqnum`` column
    yet, assign it in delivery order (the LogWriter stepping its
    counter as it renders). $RCPTID/$UNIQID are deliberately NOT
    assigned here: they are reception ids — the same message must
    render the same id at every destination, so only the source side
    (use-uniqid) assigns them; without that they render unset, exactly
    like the reference with use-uniqid(no)."""
    return ensure_seqnum_counted(
        df, *template_strs, templates=templates, start=start)[0]


def ensure_seqnum_counted(
    df: DataFrame,
    *template_strs: str | None,
    templates: dict | None = None,
    start: int = 1,
) -> tuple[DataFrame, int]:
    """ensure_seqnum + the number of rows numbered (0 when the
    template doesn't reference $SEQNUM or the column already exists).
    The count is free — the numbering pass already aggregates
    per-partition counts — and lets a long-lived writer (foreachBatch
    across micro-batches) continue its counter like the daemon's
    LogWriter living across delivery bursts."""
    if "seqnum" in df.columns:
        return df, 0
    from syslog_ng_spark.template import referenced_names

    if not any(
        t and "SEQNUM" in referenced_names(t, templates) for t in template_strs
    ):
        return df, 0
    return _numbered(df, "seqnum", start, None, wrap=_SEQNUM_WRAP)
