"""Sampling and sequence-packing operators (LLM-pipeline extensions).

Training-data pipelines control the *mixture* of a corpus (per-source /
per-language quotas) and pack variable-length documents into
fixed-length training sequences. Both are deterministic here — hash
selection, not RNG — so a pipeline re-run (or a second engine, the
DuckDB oracle) reproduces the exact same sample and packing.

Scale notes (100 TB):
- stratified_sample: one codegen'd column expression per row, no
  shuffle at all — the filter pushes into the scan stage. Rates are a
  small literal CASE, not a join.
- sequence_pack: packing needs an ORDER — a global sort is a total
  exchange, the classic scale killer. Instead docs are hash-sharded
  (md5-mod, engine-portable) and packed per shard with a window; each
  shard's window is one partition's local sort. Shard count scales
  with the cluster; packs never span shards, so the result is stable
  under any executor count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# hash denominator: rates are expressed in basis points out of 10_000
# so a rate like 0.0731 is exact and the SQL oracle needs no float
# comparison
_DENOM = 10_000


def _rate_to_bp(rate: float, what: str) -> int:
    """Validate and quantize a keep-rate to basis points. Rates outside
    [0, 1] are caller bugs; a nonzero rate that quantizes to 0 bp would
    SILENTLY drop the whole stratum (anything below 0.00005), which is
    never what the caller meant — raise instead of rounding to zero."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"{what}: rate {rate} outside [0, 1]")
    bp = int(round(rate * _DENOM))
    if bp == 0 and rate > 0.0:
        raise ValueError(
            f"{what}: rate {rate} quantizes to 0 of {_DENOM} basis points "
            "and would drop the entire stratum; use 0.0 explicitly or a "
            f"rate >= {1.0 / _DENOM}"
        )
    return bp


def _hash_mod(c: Column, denom: int = _DENOM, salt: str = "") -> Column:
    """md5-derived uniform bucket in [0, denom) — the engine-portable
    equivalent of `hash(x) % denom` (Spark's murmur3 is not
    reproducible in other engines; md5 is everywhere). `salt` decouples
    independent sampling decisions on the same key."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 15), 16, 10
        ).cast("long")
        % denom
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the mixture-control
    step of a training-data pipeline ("keep 10% of Common Crawl, 100%
    of books"). A row survives iff md5-hash(id+salt) mod 10000 falls
    under its stratum's rate; rates are interpreted as fractions and
    quantized to basis points.

    Being a pure column predicate it costs zero shuffles and the
    filter runs inside the scan's codegen stage; re-running with the
    same salt reproduces the exact sample (hash, not RNG), and a
    DIFFERENT salt draws an independent sample for holdout splits."""
    rate_bp = F.lit(_rate_to_bp(default_rate, "default_rate"))
    expr = None
    for value, rate in sorted(rates.items()):
        cond = F.col(strata_col) == value
        bp = F.lit(_rate_to_bp(rate, f"rates[{value!r}]"))
        expr = F.when(cond, bp) if expr is None else expr.when(cond, bp)
    rate_col = expr.otherwise(rate_bp) if expr is not None else rate_bp
    return df.where(_hash_mod(F.col(id_col), salt=salt) < rate_col)


def mixture_sample(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    token_budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Token-budgeted mixture sampling — the Pile/DoReMi step that
    turns "train on B tokens at mixture weights w" into per-source
    keep-rates: rate_s = min(1, B·w_s / T_s) where T_s is the source's
    token total. Sources absent from `weights` get weight 0 and are
    dropped (an explicit mixture IS the keep-list).

    Down-sample only: a source too small for its target (T_s < B·w_s)
    keeps rate 1 and under-delivers — repeat-epoch upweighting is the
    trainer's loader job, not the sampler's (re-reading a source to
    hit a share silently multiplies its dup exposure; see Lee 2022).
    A positive target never rounds to a zero rate: rates quantize to
    basis points with a floor of 1 bp, so a weighted source is always
    represented (budget error ≤ T_s/10000 ≪ the sketching error of
    T_s itself at corpus scale).

    Distributed shape: ONE hash-shuffle aggregate for the per-source
    token totals (a handful of rows), broadcast back, then the same
    zero-shuffle md5 keep-predicate as stratified_sample — the filter
    runs inside the scan's codegen stage, reproducible from (weights,
    budget, salt) alone on any engine. round(…, 6) before the floor
    makes the bp boundary portable across double ULPs."""
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("mixture weights must sum to a positive value")
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    wexpr = None
    for value, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"weights[{value!r}] is negative")
        cond = F.col(source_col) == value
        lit = F.lit(w / wsum)
        wexpr = F.when(cond, lit) if wexpr is None else wexpr.when(cond, lit)
    wcol = wexpr.otherwise(F.lit(0.0))
    totals = df.groupBy(source_col).agg(F.sum(token_col).alias("_toks"))
    # a weighted source whose token total is 0 (or NULL: all-null token
    # column) has no defined rate — drop it explicitly rather than let
    # the 0-division NULL propagate differently per engine
    # (Spark greatest() skips NULLs -> 1bp; DuckDB NULL rate drops rows)
    totals = totals.where(F.col("_toks") > 0)
    rates = totals.select(
        F.col(source_col).alias("_src"),
        F.least(
            F.lit(_DENOM),
            F.greatest(
                F.lit(1),
                F.floor(
                    F.round(
                        F.lit(float(token_budget)) * wcol / F.col("_toks") * _DENOM,
                        6,
                    )
                ),
            ),
        ).cast("long").alias("_rate_bp"),
        wcol.alias("_w"),
    ).where(F.col("_w") > 0).drop("_w")
    return (
        df.join(F.broadcast(rates), F.col(source_col) == F.col("_src"))
        .where(_hash_mod(F.col(id_col), salt=salt) < F.col("_rate_bp"))
        .drop("_rate_bp", "_src")
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Temperature-based mixture rebalancing — the exponential-
    smoothing recipe multilingual LM pipelines use (mBERT/XLM-R style):
    target stratum shares q_s ∝ p_s^alpha, where p_s is the stratum's
    corpus share. Achieved by per-stratum keep-rate
    r_s = (n_min / n_s)^(1 - alpha), which is ∝ p_s^(alpha-1) and
    normalized so the smallest stratum keeps rate 1 — downsample-only,
    no stratum is ever upsampled. alpha=1 keeps everything unchanged;
    alpha=0 flattens every stratum down to the smallest one's size;
    0<alpha<1 interpolates (head languages shed data, tail languages
    keep theirs).

    Unlike `stratified_sample` the rates are DATA (one tiny aggregate,
    broadcast back), not literals — one groupBy over the stratum
    column plus a broadcast join, then the same md5 keep-predicate.

    Rows with a NULL stratum form their own stratum: groupBy keeps the
    NULL group and the rate join is null-safe (`eqNullSafe` / SQL
    `IS NOT DISTINCT FROM`), so they are rebalanced like any other
    stratum instead of being silently dropped by a null join key —
    consistent with stratified_sample's default-rate handling."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    p_min = counts.agg(F.min("_n").alias("_m"))
    rates = (
        counts.crossJoin(F.broadcast(p_min))
        # quantize to basis points; the pre-floor round(…, 6) absorbs
        # the ~1-ulp pow() differences between engines so the floor
        # boundary (and thus every keep/drop decision) is portable
        .select(
            F.col(strata_col).alias("_stratum"),
            F.floor(
                F.round(F.pow(F.col("_m") / F.col("_n"), F.lit(1.0 - alpha)) * _DENOM, 6)
            ).cast("long").alias("_rate_bp"),
        )
    )
    return (
        df.join(F.broadcast(rates), F.col(strata_col).eqNullSafe(F.col("_stratum")))
        .where(_hash_mod(F.col(id_col), salt=salt) < F.col("_rate_bp"))
        .drop("_rate_bp", "_stratum")
    )


def sequence_pack(
    df: DataFrame,
    len_col: Column,
    context_len: int = 2048,
    id_col: str = "doc_id",
    shards: int = 16,
) -> DataFrame:
    """Sequential sequence packing: concatenate documents in a
    deterministic order and cut the stream into `context_len`-token
    training sequences. Each doc is tagged with the pack it STARTS in
    plus its token offset — the metadata a downstream tokenizer worker
    needs to materialize the packed batches.

    This is the "pack-then-split" recipe (docs may straddle a pack
    boundary and get split, nothing is padded away); true first-fit
    bin packing is NP-ish and order-dependent, while sequential
    packing is a pure running sum — expressible as a window, verified
    by a SQL oracle, and identical on any engine.

    Packing is per-shard (md5-mod on the id), NOT a global sort:
    window `PARTITION BY shard ORDER BY id` sorts only within each
    shard, shards run in parallel, and pack ids are (shard, local)
    pairs so output is stable no matter how many executors run it."""
    shard = _hash_mod(F.col(id_col), denom=shards, salt="pack")
    out = df.select(F.col(id_col), shard.alias("shard"), len_col.cast("long").alias("n_tokens"))
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    staged = out.select(
        id_col, "shard", "n_tokens", (cum - F.col("n_tokens")).alias("tok_start")
    )
    # integer DIV, not float `/`: a double round-trip is only exact up
    # to 2^53 and a busy shard's running token count can pass that
    return staged.select(
        id_col,
        "shard",
        "n_tokens",
        "tok_start",
        F.expr(f"tok_start DIV {int(context_len)}").alias("pack_id"),
        (F.col("tok_start") % context_len).cast("long").alias("pack_offset"),
    )


def gumbel_topk_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
    log_weights: bool = True,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Gumbel-top-k
    trick: drawing k items with probability ∝ exp(logw) is exactly
    taking the k largest (logw + Gumbel noise). The noise is
    hash-seeded (md5 of id+salt → uniform in (0,1) → -ln(-ln u)), so
    the draw is deterministic, replayable, and engine-portable — the
    same property stratified_sample gets from hash-mod, extended to
    continuous weights. This is the SELECTION step downstream of
    dsir_logweight (importance resampling: weight, then Gumbel-draw).

    Scale shape: one column expression per row + a global top-k
    (TakeOrderedAndProject — partial top-k per partition, only k rows
    shuffle). A different salt draws an independent sample."""
    u = (
        _hash_mod(F.col(id_col), denom=1_000_000_007, salt="gumbel" + salt).cast("double")
        + 0.5
    ) / 1_000_000_007.0
    gumbel = -F.log(-F.log(u))
    w = F.col(weight_col) if log_weights else F.log(weight_col)
    key = F.round(w + gumbel, 9)
    return (
        df.withColumn("_gkey", key)
        .orderBy(F.desc("_gkey"), F.asc(id_col))
        .limit(k)
        .drop("_gkey")
    )


def quantile_select(
    df: DataFrame,
    score_col: str,
    group_col: str | None = None,
    q: float = 0.7,
    keep: str = "above",
    method: str = "exact",
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group quantile-threshold selection: keep rows whose score is
    >= (or < for keep='below') their group's q-quantile — the
    FineWeb/CCNet 'keep the top X% by quality per language' curation
    step, as a relational plan.

    The thresholds are one row per group (languages, domains —
    thousands at most): a single hash-shuffle aggregate, broadcast
    back, no window over the corpus and no global sort.

    method='exact': interpolated percentile (matches DuckDB
    quantile_cont for the oracle) — it buffers each group's scores, so
    a skewed group concentrates memory on one reducer.
    method='approx': approx_percentile with `accuracy` (G-K sketch,
    bounded memory per group, rank error <= 1/accuracy) in the SAME
    plan shape — the threshold agg is the only change, the broadcast
    join stays. This is the 100 TB path; the quantile_select_approx
    gate + epsilon-band pytest pin it to the exact one. Thresholds are
    rounded to 6 decimals so the >= comparison is engine-stable."""
    from syslog_ng_spark.util import quantile_agg_expr

    agg = quantile_agg_expr(score_col, q, method, accuracy)
    keys = [group_col] if group_col else []
    thr = df.groupBy(*keys).agg(F.round(F.expr(agg), 6).alias("_thr"))
    joined = df.join(F.broadcast(thr), keys) if keys else df.crossJoin(F.broadcast(thr))
    pred = (
        F.col(score_col) >= F.col("_thr")
        if keep == "above"
        else F.col(score_col) < F.col("_thr")
    )
    return joined.where(pred).drop("_thr")


def global_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic global shuffle into training shards — the 'shuffle
    the corpus before training' step every LLM data pipeline ends with.

    Each row gets a pseudo-random 128-bit key = md5(id || seed);
    shard = key-prefix mod n_shards, and `pos` is the row's rank inside
    its shard ordered by (key, id). The result is a uniform random
    permutation that any engine reproduces bit-for-bit from (seed,
    n_shards) alone — re-running the pipeline, resuming after failure,
    or auditing with the DuckDB oracle all see the same order. No RNG
    state, no zipWithIndex.

    Scale shape (100 TB): ONE hash shuffle on `shard` + a per-shard
    local sort (the window is partitioned by shard, so no global
    total-order exchange — the classic orderBy(rand()) scale killer
    this replaces). Shard count should track the cluster (e.g. 10k
    shards at 100 TB -> 10 GB sorted runs). Readers stream shards in
    shard order and get an unbiased sample prefix at any cutoff.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed)))
    shard = (
        F.conv(F.substring(key, 1, 15), 16, 10).cast("long") % n_shards
    ).cast("bigint")
    with_key = df.withColumn("_shuffle_key", key).withColumn("shard", shard)
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard").orderBy("_shuffle_key", id_col)
    return (
        with_key.withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("_shuffle_key")
    )


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: str = "",
    mode: str = "overwrite",
) -> None:
    """Materialize `global_shuffle` as one directory per shard
    (shard=N/ partition dirs), rows within each file in shuffled
    order. `repartition(n_shards, shard)` co-locates each shard before
    the write so a shard is one sorted file, not one per upstream
    partition; sortWithinPartitions carries the shuffle order into
    the file layout (parquet row order is preserved on read)."""
    shuffled = global_shuffle(df, id_col, n_shards, seed)
    (
        shuffled.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
