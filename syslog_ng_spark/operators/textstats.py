"""Text analysis operators (LLM-pipeline extensions).

Quality scoring, token counting, language-ID heuristic, and document
fingerprinting over a text column. Every op is a JVM column expression
(regex + arithmetic) so it runs inside whole-stage codegen; all are
deterministic and SQL-portable for oracle verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"]

# tiny per-language stopword tables for the n-gram/stopword-hit
# language heuristic (deterministic, SQL-expressible)
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "fr": ["le", "la", "et", "est"],
    "es": ["el", "la", "y", "es"],
    "de": ["der", "die", "und", "ist"],
    "zh": ["de", "shi", "he", "zai"],
}

TOKEN_RE = r"[a-z0-9]+(?:'[a-z]+)?|[^a-z0-9\s]"


def tokens(c: Column) -> Column:
    return F.split(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")), " ")


def token_count(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(c))


def bpe_ish_count(c: Column) -> Column:
    """BPE-ish subword proxy: count of TOKEN_RE matches on lowered text
    (words + punctuation as separate tokens)."""
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0))


def stopword_ratio(c: Column) -> Column:
    toks = tokens(c)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.round(hits / F.greatest(F.size(toks), F.lit(1)), 6)


def alpha_ratio(c: Column) -> Column:
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    return F.round(alpha / F.greatest(F.length(c), F.lit(1)), 6)


def avg_token_len(c: Column) -> Column:
    toks = tokens(c)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence
    + alphabetic density (Gopher-style rules, arithmetic only)."""
    n_tok = token_count(c)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 1000), 1.0).otherwise(0.0)
    sw = stopword_ratio(c)
    sw_ok = F.when((sw >= 0.05) & (sw <= 0.6), 1.0).otherwise(0.0)
    return F.round((len_ok + sw_ok + alpha_ratio(c)) / 3.0, 6)


def lang_id(c: Column) -> Column:
    """Stopword-hit argmax over LANG_MARKERS; ties go to the earlier
    language in the table (deterministic)."""
    toks = tokens(c)
    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append((lang, F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))))
    # deterministic argmax via struct-max: ties broken by table order
    packed = F.array(
        *[
            F.struct(s.alias("score"), F.lit(-i).alias("prio"), F.lit(lang).alias("lang"))
            for i, (lang, s) in enumerate(scores)
        ]
    )
    top = F.array_max(packed)
    return F.when(top["score"] > 0, top["lang"]).otherwise(F.lit("und"))


def fingerprint(c: Column, width: int = 16) -> Column:
    """Document fingerprint: md5 of normalized text, truncated — the
    cheap exactdup / shard-routing key."""
    norm = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.substring(F.md5(norm), 1, width)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "n_subwords": bpe_ish_count(c),
            "avg_token_len": avg_token_len(c),
            "stopword_ratio": stopword_ratio(c),
            "alpha_ratio": alpha_ratio(c),
            "quality": quality_score(c),
            "fingerprint": fingerprint(c),
        }
    )


def symbol_word_ratio(c: Column) -> Column:
    """Gopher rule: #/... symbol count per word (high => boilerplate)."""
    syms = F.size(F.regexp_extract_all(c, F.lit(r"[#*>|=~\\{}\[\]]|\.\.\."), 0))
    return F.round(syms / F.greatest(token_count(c), F.lit(1)), 6)


def bullet_line_ratio(c: Column) -> Column:
    """Gopher rule: fraction of lines starting with a bullet marker."""
    lines = F.split(c, "\n")
    bullets = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]")))
    return F.round(bullets / F.greatest(F.size(lines), F.lit(1)), 6)


def ellipsis_line_ratio(c: Column) -> Column:
    """Gopher rule: fraction of lines ending with an ellipsis."""
    lines = F.split(c, "\n")
    ell = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$")))
    return F.round(ell / F.greatest(F.size(lines), F.lit(1)), 6)


def digit_ratio(c: Column) -> Column:
    return F.round(
        F.length(F.regexp_replace(c, r"[^0-9]", ""))
        / F.greatest(F.length(c), F.lit(1)),
        6,
    )


def uppercase_word_ratio(c: Column) -> Column:
    """Fraction of words that are ALL-CAPS (>=2 chars) on the RAW text
    (casing is the signal, so this must not lowercase first)."""
    words = F.split(F.trim(F.regexp_replace(c, r"\s+", " ")), " ")
    caps = F.size(F.filter(words, lambda w: w.rlike(r"^[A-Z]{2,}$")))
    return F.round(caps / F.greatest(F.size(words), F.lit(1)), 6)


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher-style repetition/format rule bundle as columns plus a
    keep/drop verdict — the corpus-filtering companion to
    quality_score (all pure column arithmetic, codegen'd)."""
    c = F.col(text_col)
    out = df.withColumns(
        {
            "symbol_word_ratio": symbol_word_ratio(c),
            "bullet_line_ratio": bullet_line_ratio(c),
            "ellipsis_line_ratio": ellipsis_line_ratio(c),
            "digit_ratio": digit_ratio(c),
            "uppercase_word_ratio": uppercase_word_ratio(c),
            "n_tokens": token_count(c).cast("long"),
            "avg_token_len": avg_token_len(c),
        }
    )
    keep = (
        (F.col("n_tokens") >= 10)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("bullet_line_ratio") <= 0.9)
        & (F.col("ellipsis_line_ratio") <= 0.3)
        & (F.col("digit_ratio") <= 0.3)
        & (F.col("avg_token_len").between(2.0, 12.0))
    )
    return out.withColumn("gopher_keep", keep)


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-document mean unigram negative log-probability under the
    corpus's OWN unigram distribution — the in-corpus stand-in for
    CCNet-style LM-perplexity quality filtering (no external model in
    this sandbox; the statistic is the same shape: low = head-token
    boilerplate, high = rare-token / noisy text). Add-`smoothing`
    estimates keep unseen-token mass finite.

    Shape at 100 TB: one explode + two aggregations. The unigram table
    is a groupBy over tokens (map-side partial agg; vocabulary, not
    corpus, sized) joined back on the token key — the same join the
    OOV-rate filter uses; nothing is collected to the driver.

    ln() on both engines is libm log — cross-engine ULP noise is
    absorbed by round(…, 6) AFTER the mean (the oracle mirrors the
    exact expression shape)."""
    toked = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    # totals derive from the vocab-sized unigram table (r14, same
    # identity as bigram_logprob): N = Σ counts, V = row count — drops
    # the separate tokenize+countDistinct pass. The uni_c subtree is
    # still planned independently per branch (no exchange reuse,
    # plan-checked); a window-sum rewrite was NOT applied here because
    # unlike dsir's dim-bounded ratio table the vocabulary is unbounded
    # at scale and partitionBy() would sort it on a single task.
    uni_c = toked.groupBy("tok").agg(F.count(F.lit(1)).alias("_c"))
    totals = uni_c.agg(F.sum("_c").alias("_n"), F.count(F.lit(1)).alias("_v"))
    uni = (
        uni_c.crossJoin(F.broadcast(totals))
        .select(
            "tok",
            # ln p(tok) with add-k smoothing; NOT rounded here — the
            # per-doc mean is rounded once at the end on both engines
            F.log((F.col("_c") + smoothing) / (F.col("_n") + smoothing * F.col("_v"))).alias(
                "_lp"
            ),
        )
    )
    return (
        toked.join(uni, "tok")
        .groupBy(id_col)
        .agg(F.round(-F.avg("_lp"), 6).alias("neg_logprob"), F.count(F.lit(1)).alias("n_tokens"))
    )


def hashed_bow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """Feature-hashing text embedding (the hashing trick, Weinberger
    et al. 2009), kept SPARSE: one row per (doc, bucket) with an
    INTEGER weight — each token occurrence adds ±1 to bucket
    md5(token) % dim, sign from the next hash bit. Integer weights
    make every downstream dot product / norm exact and
    engine-portable until the single final division.

    Sparse is also the right 100 TB layout: a (doc, bucket, weight)
    table joins on `bucket` (hash shuffle, co-partitionable) instead
    of materializing dense arrays per row; density is min(n_tokens,
    dim) per doc."""
    h = F.conv(F.substring(F.md5(F.col("_tok")), 1, 15), 16, 10).cast("long")
    return (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok"))
        .select(id_col, h.alias("_h"))
        .select(
            id_col,
            (F.col("_h") % dim).alias("bucket"),
            # integer DIV — float `/` on a 60-bit hash loses exactness
            F.when(F.expr(f"(_h DIV {int(dim)}) % 2") == 1, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("_s"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("_s").alias("weight"))
        .where(F.col("weight") != 0)
    )


def hashed_bow_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """Text similarity search with no model: hashed-BoW embed, cosine
    against the query doc, top-k. The query's sparse vector is a few
    dozen rows — broadcast; the corpus side joins on `bucket`, so the
    dot product is one hash join + groupBy over only the buckets the
    query touches (classic sparse-retrieval pruning: buckets the query
    lacks contribute nothing and are never read). Norms are integer
    sums; the only FP step is the final divide, rounded to 6."""
    from pyspark import StorageLevel

    # the tokenize→explode→md5→groupBy sub-plan feeds norms, q, dots
    # AND qn2 — persist it once instead of recomputing ~4x (same
    # convention as dedup.py: persisted intermediate, Spark evicts
    # under pressure, unpersisted with the session)
    bow = hashed_bow(df, text_col, id_col, dim).persist(StorageLevel.MEMORY_AND_DISK)
    q = bow.where(F.col(id_col) == query_id).select(
        "bucket", F.col("weight").alias("_qw")
    )
    qn2 = bow.where(F.col(id_col) == query_id).agg(
        F.sum(F.col("weight") * F.col("weight")).alias("_qn2")
    )
    # dot AND norm in ONE per-doc aggregate (r14): a LEFT broadcast
    # join keeps every (doc, bucket) row, so sum(w*coalesce(qw, 0))
    # is exactly the old inner-join dot (non-shared buckets add 0)
    # while sum(w*w) is the full norm — the separate norms aggregate
    # and the dots⋈norms shuffle join disappear. count(_qw) > 0 is
    # the old inner join's "shares >= 1 bucket" membership, so the
    # result set is row-identical; all sums are integer (exact).
    from syslog_ng_spark.util import track_cached

    out = (
        bow.where(F.col(id_col) != query_id)
        .join(F.broadcast(q), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("weight") * F.coalesce(F.col("_qw"), F.lit(0))).alias("_dot"),
            F.sum(F.col("weight") * F.col("weight")).alias("_n2"),
            F.count(F.col("_qw")).alias("_nq"),
        )
        .where(F.col("_nq") > 0)
        .crossJoin(F.broadcast(qn2))
        .select(
            id_col,
            F.round(
                F.col("_dot") / (F.sqrt(F.col("_n2")) * F.sqrt(F.col("_qn2"))), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
    return track_cached(out, bow)


# SQL-text fragments for the hashed-n-gram feature pipeline (r14):
# byte-for-byte the expressions the Column API built — filter(tokens)
# per the `tokens()` helper, one md5 per token pre-reduced mod dim,
# bigram buckets via the modular combine (31*u_i + u_{i+1}) % dim.
_TOKENS_SQL = (
    "filter(split(trim(regexp_replace(lower({text}), '\\\\s+', ' ')), ' '), w -> w != '')"
)
_UHASH_SQL = (
    "transform(_t, w -> CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT) % {dim})"
)
_FEATS_SQL = (
    "CASE WHEN size(_u) >= 2 THEN concat(_u, transform(sequence(1, size(_u) - 1), "
    "i -> (element_at(_u, i) * 31 + element_at(_u, i + 1)) % {dim})) ELSE _u END"
)


def _hashed_ngram_features(
    df: DataFrame, text_col: str, id_col: str, dim: int
) -> DataFrame:
    """Hashed unigram+bigram feature instances per doc — the DSIR
    feature space (Xie et al. 2023 use hashed n-grams into a fixed
    bucket count). One row per feature OCCURRENCE (not distinct):
    importance weights multiply per occurrence.

    The token array is materialized as a column BEFORE the bigram
    lambda: an expression captured inside a higher-order function is
    re-evaluated per element, so an inlined tokens() would re-run the
    regex+split once per bigram — O(tokens²) per doc (measured 10.3s
    → 1.9s for the sf0.1 feature pass).

    r6 constant trim (VERDICT task 6): each token is md5-hashed ONCE
    and pre-reduced mod dim; a bigram's bucket is the modular combine
    (31·u_i + u_{i+1}) mod dim of the two reduced unigram hashes —
    exact under congruence, so DuckDB replays it. That halves the md5
    evaluations (~54 vs ~107 per doc) and removes the bigram string
    concat + its md5-of-longer-input entirely. The bucket values
    differ from r5's (it hashed the bigram STRING) — the oracle
    changed with it; the hash family is still Xie 2023's hashed
    n-grams into a fixed bucket count."""
    # NOTE: deliberately NOT routed through _hashed_ngram_feature_array
    # + a second select: Generate(explode) sits directly on the staged
    # projection, so `_u` stays a materialized column. An intermediate
    # Project(feats) gets collapsed into `staged` by Catalyst, which
    # re-inlines the token-hash transform into the per-element bigram
    # lambda — the O(tokens²) re-evaluation this docstring warns
    # about (measured: dsir_logweight 0.6 s -> >120 s at sf0.1 when a
    # round-8 refactor briefly introduced exactly that shape).
    # Rendered as SQL text (r14): one parse call per stage instead of
    # ~1100 py4j round trips for the HOF lambdas — ~0.35 s of driver
    # build time per call; the parsed trees are the ones the Column
    # API built (same two-select staging, same collapse behavior).
    base = df.select(F.col(id_col), F.expr(_TOKENS_SQL.format(text=text_col)).alias("_t"))
    staged = base.select(F.col(id_col), F.expr(_UHASH_SQL.format(dim=dim)).alias("_u"))
    return staged.select(
        F.col(id_col),
        F.explode(F.expr(_FEATS_SQL.format(dim=dim))).alias("bucket"),
    )


def _hashed_ngram_feature_array(
    df: DataFrame, text_col: str, id_col: str, dim: int
) -> DataFrame:
    """(id, feats array<long>) — the un-exploded form of
    `_hashed_ngram_features` (one array element per feature
    OCCURRENCE). Used where a per-doc reduction over the features
    follows (the quality classifier's dot product): keeping the array
    avoids the explode+groupBy shuffle entirely. Consumers must fold
    the array in ONE select (see the collapse note above). SQL-text
    rendered like _hashed_ngram_features (r14)."""
    base = df.select(F.col(id_col), F.expr(_TOKENS_SQL.format(text=text_col)).alias("_t"))
    staged = base.select(F.col(id_col), F.expr(_UHASH_SQL.format(dim=dim)).alias("_u"))
    return staged.select(
        F.col(id_col), F.expr(_FEATS_SQL.format(dim=dim)).alias("feats")
    )


def dsir_logweight(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    smoothing: float = 0.5,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much more likely its hashed-n-gram features are
    under the TARGET distribution than under the RAW distribution —
    log w(doc) = Σ_features ln p_target(bucket) − ln p_raw(bucket).
    Selection is then top-k / Gumbel sampling on logw (compose with
    stratified_sample for the replayable draw).

    Shape at 100 TB: the two bucket-probability tables are dim rows
    (1024 here) — broadcast; the per-doc score is one explode + one
    broadcast join + one groupBy with map-side partial agg. The
    target corpus is typically tiny (the quality seed, e.g. wiki);
    the raw side streams through once. ln ULP noise across engines is
    absorbed by round(…, 6) after the sum (same convention as
    unigram_logprob)."""
    raw_f = _hashed_ngram_features(raw, text_col, id_col, dim).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    tgt_f = _hashed_ngram_features(target, text_col, id_col, dim)

    # ONE dim-sized ratio table carrying the per-bucket log-weight
    # contribution (r6: replaces the r5 shape's two broadcast joins +
    # two crossJoins with a single broadcast join against the scored
    # pass). Totals derive from the counts tables (≤ dim rows), not
    # from rescanning the feature streams.
    rc = raw_f.groupBy("bucket").agg(F.count(F.lit(1)).alias("_rc"))
    tc = tgt_f.groupBy("bucket").agg(F.count(F.lit(1)).alias("_tc"))
    # totals as unbounded-window sums over the dim-sized joined table
    # (r14): the separate rn/tn aggregates were each a broadcast-build
    # job — and tn re-ran the whole TARGET feature pipeline a second
    # time (no exchange reuse across the branches, plan-checked). One
    # window over <= dim rows computes both totals exactly: the join
    # is FULL outer so a target bucket absent from raw still counts
    # toward _tn (sum ignores the nulls the outer sides introduce);
    # rows with no raw count render a null _lw that no raw feature can
    # ever join (their bucket has no raw occurrence) — the scored
    # stream is row-identical.
    from pyspark.sql import Window

    wall = Window.partitionBy()
    ratio = (
        rc.join(tc, "bucket", "full")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("_tc"), F.lit(0)) + smoothing)
                    / (F.coalesce(F.sum("_tc").over(wall), F.lit(0)) + smoothing * dim)
                )
                - F.log(
                    (F.col("_rc") + smoothing)
                    / (F.sum("_rc").over(wall) + smoothing * dim)
                )
            ).alias("_lw"),
        )
    )
    scored = raw_f.join(F.broadcast(ratio), "bucket").select(id_col, "_lw")
    from syslog_ng_spark.util import track_cached

    out = scored.groupBy(id_col).agg(
        F.round(F.sum("_lw"), 6).alias("logw"), F.count(F.lit(1)).alias("n_feats")
    )
    return track_cached(out, raw_f)


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
    lam: float = 0.7,
) -> DataFrame:
    """Per-document mean negative log-probability under an
    interpolated bigram model trained on the corpus itself — one
    modeling step up from unigram_logprob toward the CCNet 5-gram
    KenLM perplexity filter:

        p(t_i | t_{i-1}) = lam * (c(prev,cur)+k)/(c(prev)+kV)
                         + (1-lam) * (c(cur)+k)/(N+kV)

    (add-k smoothing both components, V = corpus vocabulary, N =
    corpus token count; c(prev) is the corpus unigram count).
    Repetitive/boilerplate text scores low, rare-transition noisy
    text high — and unlike the unigram score it penalizes shuffled
    word salad whose token histogram looks normal.

    Shape at 100 TB: bigrams come from an array-shift transform on
    the bound token array (no per-doc window/sort); the bigram and
    unigram tables are vocabulary²-bounded groupBys with map-side
    partials, joined back on token keys; AQE picks broadcast when the
    vocab is small. Docs with < 2 tokens drop out (no transitions).
    round(…, 6) once after the mean, mirrored by the oracle."""
    from syslog_ng_spark.util import rebalance

    # totals derive from the vocab-sized unigram table (r14): N = Σ
    # counts, V = row count — identities, not estimates — which drops
    # one full tokenize+explode pass over the corpus (the old separate
    # count/countDistinct aggregate). A persist of the token arrays
    # was ALSO tried and measured SLOWER (2.15s vs 1.70s at sf0.1):
    # the cache-materialization barrier costs more than re-running the
    # regex split per branch on 32 local cores — recorded here so it
    # isn't "fixed" back in.
    base = rebalance(df).withColumn("_toks", tokens(F.col(text_col)))
    toks = F.col("_toks")
    toked = base.select(F.col(id_col), F.explode(toks).alias("tok"))
    # uni is referenced THREE times (totals, the _cp join, the _cu
    # join) with no exchange reuse across the branches — persisting it
    # was tried (r14) and measured SLOWER at sf0.1 (1.36 s -> 1.50 s,
    # alternated A/B): the vocab-sized cache's materialization barrier
    # costs more than re-running the codegen'd pipelines on 32 local
    # cores, the same verdict as the token-array persist above. Left
    # on recompute deliberately.
    uni = toked.groupBy("tok").agg(F.count(F.lit(1)).alias("_c"))
    totals = uni.agg(
        F.sum("_c").alias("_n"), F.count(F.lit(1)).alias("_v")
    )
    bg = (
        base.where(F.size(toks) >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("prev"),
                        F.element_at(toks, i + 1).alias("cur"),
                    ),
                )
            ).alias("_bg"),
        )
        .select(id_col, F.col("_bg.prev").alias("prev"), F.col("_bg.cur").alias("cur"))
    )
    bgt = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("_cb"))
    k = F.lit(smoothing)
    # score the vocabulary²-bounded bigram TABLE, then join the
    # occurrence stream ONCE (r15, the unigram_logprob shape): log p
    # is a function of the bigram type alone, so computing it before
    # the occurrence join is value-identical per row — and the corpus-
    # sized bg stream now passes through one join instead of three
    # (bgt, uni(prev), uni(cur)); the remaining small joins all run on
    # vocab-sized tables (guide §2.4/§3 — at 100 TB those were three
    # shuffle joins of every bigram occurrence).
    p = F.lit(lam) * (F.col("_cb") + k) / (F.col("_cp") + k * F.col("_v")) + F.lit(
        1 - lam
    ) * (F.col("_cu") + k) / (F.col("_n") + k * F.col("_v"))
    scored_bgt = (
        bgt.join(uni.select(F.col("tok").alias("prev"), F.col("_c").alias("_cp")), "prev")
        .join(uni.select(F.col("tok").alias("cur"), F.col("_c").alias("_cu")), "cur")
        .crossJoin(F.broadcast(totals))
        .select("prev", "cur", F.log(p).alias("_lp"))
    )
    # shuffle_hash hint: the static size estimate for scored_bgt
    # (three joins + a crossJoin) comes out ABOVE the bg stream's, so
    # the planner broadcast the exploded occurrence stream (BuildLeft —
    # measured 7.6 s runs when AQE didn't rescue it). The hint pins a
    # shuffled hash join — the honest 100 TB shape, where bigram TYPES
    # can outgrow a broadcast but the per-partition build side stays
    # vocab²-bounded — and AQE's runtime stats still flip it to a
    # broadcast of scored_bgt whenever the vocab is actually small
    # (measured: 1.49 s, same as the pre-rewrite shape locally).
    return (
        bg.join(scored_bgt.hint("shuffle_hash"), ["prev", "cur"])
        .groupBy(id_col)
        .agg(
            F.round(-F.avg("_lp"), 6).alias("neg_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


def vocab_growth(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10,
) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct token
    types vs cumulative token count over corpus-prefix buckets
    (ingestion order by id). The dataset-statistics staple for judging
    whether more raw data still buys new vocabulary — a flattening
    curve means scraping more of the same source adds tokens but no
    types (Heaps 1978; beta ~0.4-0.6 for natural text, ~1.0 for
    near-random ids/hashes).

    Distributed shape: a type's first appearance is min(bucket) over
    its occurrences — ONE hash shuffle on the token key (map-side
    partial min), a per-bucket count (second small agg), then the
    cumulative sums run over exactly `buckets` rows (a deliberate
    1-partition window over a constant-size frame, not over data).
    The max-id scalar rides a 1-row broadcast crossJoin (the q22
    pattern). No collect, no per-row Python.
    """
    from pyspark.sql import Window

    mx = df.select(F.max(F.col(id_col)).alias("_mx"))
    # the tokenize+explode scan feeds BOTH the first-appearance agg and
    # the per-bucket token count — persist it once instead of scanning
    # the corpus twice (callers own cleanup; same convention as
    # hashed_bow_topk / dedup.py)
    t = (
        df.crossJoin(F.broadcast(mx))
        .select(
            F.least(
                F.floor(F.col(id_col) * buckets / (F.col("_mx") + 1)),
                F.lit(buckets - 1),
            )
            .cast("int")
            .alias("bucket"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    first = t.groupBy("tok").agg(F.min("bucket").alias("first_bucket"))
    new_types = first.groupBy("first_bucket").agg(
        F.count(F.lit(1)).alias("new_types")
    )
    n_toks = t.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_tokens"))
    joined = (
        n_toks.join(new_types, n_toks["bucket"] == new_types["first_bucket"], "left")
        .select(
            "bucket",
            "n_tokens",
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    from syslog_ng_spark.util import track_cached

    out = (
        joined.select(
            "bucket",
            F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
            F.sum("new_types").over(w).cast("long").alias("cum_types"),
        )
        .withColumn(
            "heaps_beta",
            F.round(F.log(F.col("cum_types")) / F.log(F.col("cum_tokens")), 6),
        )
    )
    return track_cached(out, t)


# ---------------------------------------------------------------------------
# fastText-style quality classifier (LLM-pipeline extension, r8)
# ---------------------------------------------------------------------------


def quality_classifier_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    max_iter: int = 50,
    reg: float = 0.01,
) -> list[float]:
    """Train a linear quality classifier over hashed n-gram
    bag-of-features — the fastText-shaped 'quality filter' step of the
    GPT-3/Llama data pipelines (a classifier scores every document;
    low scorers are dropped or downsampled). Features are the SAME
    md5-bucketed unigram+bigram space DSIR uses
    (`_hashed_ngram_feature_array`), so scoring stays engine-portable.

    Training is pyspark.ml LogisticRegression (distributed L-BFGS —
    one treeAggregate gradient pass per iteration, nothing
    driver-sized except the dim+1 weight vector). Returns
    [intercept, w_0 .. w_{dim-1}], which `quality_classifier_score`
    applies as a pure-Column expression and a deployment freezes as a
    fixture (training is a one-off; scoring is the corpus-scale pass).

    Count build is ONE pass over the feature array: explode →
    groupBy(doc, bucket) → per-doc (bucket → count) map — NOT a
    dim-wide transform re-filtering the array per bucket (the r8 shape
    scanned the array dim times per doc: harmless at dim=64, wrong at
    a realistic 2^16). Dense assembly then does dim lookups against
    the doc's DISTINCT-bucket map (≤ min(features, dim) entries); for
    dim beyond ~2^12 switch the assembly to a sparse-features path —
    the counts computation here already has the right shape for it.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    feats = _hashed_ngram_feature_array(df, text_col, id_col, dim)
    counts = (
        feats.select(F.col(id_col), F.explode_outer("feats").alias("_b"))
        .groupBy(id_col, "_b")
        .agg(F.count("_b").alias("_c"))  # count(col) skips the NULL of
        # an empty-text doc while keeping its (id, NULL, 0) group
        .groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.filter(
                    F.collect_list(F.struct("_b", "_c")),
                    lambda e: e["_b"].isNotNull(),
                )
            ).alias("_m")
        )
    )
    dense = counts.select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda b: F.coalesce(
                F.element_at(F.col("_m"), b.cast("long")), F.lit(0)
            ).cast("double"),
        ).alias("_counts"),
    )
    labeled = dense.join(
        df.select(F.col(id_col), F.col(label_col).cast("double").alias("label")),
        id_col,
    ).select(array_to_vector(F.col("_counts")).alias("features"), "label")
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg, standardization=False, family="binomial"
    )
    model = lr.fit(labeled)
    return [float(model.intercept)] + [float(c) for c in model.coefficients]


def quality_classifier_score(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Apply a trained/frozen [intercept, w_0..w_{dim-1}] vector:
    score = sigmoid(w0 + Σ_occurrences w[bucket]) — one pure-Column
    pass (hash, transform, aggregate; zero shuffles, zero UDFs), the
    right plan for the 100 TB scoring scan. Occurrence-sum equals the
    count·weight dot product. Engine-portable: the DuckDB oracle
    replays the bucketing and indexes the same literal weight list."""
    dim = len(weights) - 1
    if dim <= 0:
        raise ValueError("weights must be [intercept, w_0..w_{dim-1}]")
    feats = _hashed_ngram_feature_array(df, text_col, id_col, dim)
    w_arr = F.array(*[F.lit(float(w)) for w in weights[1:]])
    logit = F.aggregate(
        F.transform(F.col("feats"), lambda b: F.element_at(w_arr, (b + 1).cast("int"))),
        F.lit(float(weights[0])),
        lambda acc, x: acc + x,
    )
    return feats.select(
        F.col(id_col),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), round_to).alias("q_score"),
        F.size(F.col("feats")).cast("long").alias("n_feats"),
    )
