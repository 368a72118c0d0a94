from __future__ import annotations

from pyspark.sql import functions as F

from syslog_ng_spark.operators import sampling, similarity, textstats


def _docs(spark, n=2000):
    rows = [(i, ["en", "zh", "de"][i % 3], f"word{i % 7} text sample number {i}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_stratified_sample_rates_and_determinism(spark):
    docs = _docs(spark)
    s1 = sampling.stratified_sample(docs, "lang", {"en": 0.1, "zh": 0.5}).collect()
    s2 = sampling.stratified_sample(docs, "lang", {"en": 0.1, "zh": 0.5}).collect()
    assert sorted(r.doc_id for r in s1) == sorted(r.doc_id for r in s2)  # replayable
    by_lang = {}
    for r in s1:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    # ~667 docs per lang; hash-uniform within ±6 sigma
    assert 25 <= by_lang.get("en", 0) <= 140        # 10% of ~667
    assert 230 <= by_lang.get("zh", 0) <= 430       # 50% of ~667
    assert by_lang["de"] in (666, 667)              # default 100%


def test_stratified_sample_salt_draws_independent_sample(spark):
    docs = _docs(spark)
    a = {r.doc_id for r in sampling.stratified_sample(docs, "lang", {}, default_rate=0.2).collect()}
    b = {
        r.doc_id
        for r in sampling.stratified_sample(docs, "lang", {}, default_rate=0.2, salt="v2").collect()
    }
    assert a != b
    # independent 20% draws overlap ~4%
    assert len(a & b) < len(a) * 0.6


def test_temperature_sample_flattens_head(spark):
    # 1200 en / 600 zh / 300 de
    rows = [(i, "en" if i < 1200 else "zh" if i < 1800 else "de", "t") for i in range(2100)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    kept = sampling.temperature_sample(docs, "lang", alpha=0.5).groupBy("lang").count().collect()
    got = {r.lang: r["count"] for r in kept}
    # keep-rates: de=1.0, zh=sqrt(300/600)=.7071 -> ~424, en=sqrt(300/1200)=.5 -> ~600
    assert got["de"] == 300
    assert 530 <= got["en"] <= 670
    assert 360 <= got["zh"] <= 490
    # alpha=1 keeps everything
    full = sampling.temperature_sample(docs, "lang", alpha=1.0).count()
    assert full == 2100


def test_sequence_pack_invariants(spark):
    docs = _docs(spark, n=500)
    packed = sampling.sequence_pack(
        docs, textstats.token_count(F.col("text")), context_len=64, id_col="doc_id", shards=4
    ).collect()
    assert len(packed) == 500
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in shard_rows:
            assert r.tok_start == cum                      # contiguous stream
            assert r.pack_id == cum // 64                  # starts in the right pack
            assert r.pack_offset == cum % 64
            cum += r.n_tokens


def test_sequence_pack_stable_under_repartition(spark):
    docs = _docs(spark, n=300)
    a = sampling.sequence_pack(docs, textstats.token_count(F.col("text")), 64).collect()
    b = sampling.sequence_pack(
        docs.repartition(13), textstats.token_count(F.col("text")), 64
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def _emb(spark, n=300, dim=8):
    import math

    rows = []
    for i in range(n):
        base = [(1.0 if d == i % 4 else 0.1) for d in range(dim)]
        base = [x + 0.01 * ((i * 7 + d) % 5) for d, x in enumerate(base)]
        nrm = math.sqrt(sum(x * x for x in base))
        rows.append((i, [x / nrm for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_topk_recall_vs_exact(spark):
    emb = _emb(spark, n=200, dim=16)
    corpus = emb.where("vec_id != 0")
    query = emb.where("vec_id = 0")
    qvec = [float(x) for x in query.select("embedding").first()[0]]
    books = similarity.pq_train(corpus, m=4, k=8, iters=2)
    assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == 4
    approx = {r.vec_id for r in similarity.pq_topk(corpus, qvec, books, k=10).collect()}
    exact = {
        r.vec_id for r in similarity.cosine_topk_bruteforce(corpus, query, k=10).collect()
    }
    assert len(approx & exact) >= 8  # recall@10 >= 0.8 on clustered data
    # deterministic end-to-end: retrain + rescore gives identical codes
    books2 = similarity.pq_train(corpus, m=4, k=8, iters=2)
    assert books == books2
    enc1 = sorted(map(tuple, similarity.pq_encode(corpus, books).collect()))
    enc2 = sorted(map(tuple, similarity.pq_encode(corpus, books2).collect()))
    assert enc1 == enc2


def test_ivfpq_topk_prunes_and_recalls(spark):
    emb = _emb(spark, n=200, dim=16)
    corpus = emb.where("vec_id != 0")
    query = emb.where("vec_id = 0")
    qvec = [float(x) for x in query.select("embedding").first()[0]]
    cents = similarity.ivf_train(corpus, k=4, iters=2)
    books = similarity.pq_train(corpus, m=4, k=8, iters=2)
    got = similarity.ivfpq_topk(corpus, qvec, cents, books, k=10, nprobe=2).collect()
    exact = {
        r.vec_id for r in similarity.cosine_topk_bruteforce(corpus, query, k=10).collect()
    }
    assert len({r.vec_id for r in got} & exact) >= 8
    # pruning really happened: every result must sit in a probed cell
    assigned = similarity.ivf_assign(corpus, cents, "embedding", "cell")
    cells = {r.cell for r in assigned.where(
        F.col("vec_id").isin([r.vec_id for r in got])).collect()}
    assert len(cells) <= 2  # nprobe=2


def test_semantic_dedup_recall_vs_exact(spark):
    emb = _emb(spark)
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs_blocked(emb, 0.995, "embedding", "vec_id").collect()
    }
    cents = similarity.ivf_train(emb, k=4, iters=2)
    sem = {
        (r.id_a, r.id_b)
        for r in similarity.semantic_dedup_pairs(emb, cents, threshold=0.995).collect()
    }
    assert sem <= exact                     # within-cell pairs are a subset, never false positives
    assert exact, "test corpus must contain near-dup pairs"
    recall = len(sem) / len(exact)
    # 4 well-separated direction clusters -> near-dups share a cell
    assert recall >= 0.9, f"recall {recall}"


def test_unigram_logprob_orders_quality(spark):
    rows = [(1, "the the the the the the the the"),        # head tokens only
            (2, "the quick zephyr quixotic jabberwock"),   # rare tokens
            (3, "the the quick quick zephyr the")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.neg_logprob for r in textstats.unigram_logprob(docs).collect()}
    assert got[1] < got[3] < got[2]   # more rare mass -> higher -ln p
    n = {r.doc_id: r.n_tokens for r in textstats.unigram_logprob(docs).collect()}
    assert n[1] == 8 and n[2] == 5 and n[3] == 6


def test_gumbel_topk_sample_properties(spark):
    """Deterministic across runs, different under a different salt, and
    biased toward heavy weights (the point of the trick)."""
    from pyspark.sql import functions as F

    from syslog_ng_spark.operators.sampling import gumbel_topk_sample

    df = spark.createDataFrame(
        [(i, 10.0 if i < 50 else 0.0) for i in range(1000)], "doc_id long, logw double"
    )
    a = {r.doc_id for r in gumbel_topk_sample(df, "logw", k=60).collect()}
    b = {r.doc_id for r in gumbel_topk_sample(df, "logw", k=60).collect()}
    c = {r.doc_id for r in gumbel_topk_sample(df, "logw", k=60, salt="2").collect()}
    assert a == b  # replayable
    assert a != c  # independent draw under a new salt
    # exp(10) ~ 22000x weight: essentially all 50 heavy docs must be in
    # any 60-draw
    assert sum(1 for d in a if d < 50) == 50


def test_quantile_select_above_and_below(spark):
    from syslog_ng_spark.operators.sampling import quantile_select

    rows = [(i, "en", float(i)) for i in range(1, 11)] + [
        (100 + i, "fr", float(10 * i)) for i in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    # en: quantile_cont(0.5) over 1..10 = 5.5 -> keep 6..10
    kept = quantile_select(df, "score", group_col="lang", q=0.5)
    en = sorted(r.doc_id for r in kept.where("lang='en'").collect())
    assert en == [6, 7, 8, 9, 10]
    # fr: 10,20,30,40 -> q0.5 = 25 -> keep 30,40
    fr = sorted(r.doc_id for r in kept.where("lang='fr'").collect())
    assert fr == [103, 104]
    below = quantile_select(df, "score", group_col="lang", q=0.5, keep="below")
    assert sorted(r.doc_id for r in below.where("lang='en'").collect()) == [1, 2, 3, 4, 5]


def test_quantile_select_ungrouped(spark):
    from syslog_ng_spark.operators.sampling import quantile_select

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 5)], "doc_id long, score double"
    )
    kept = quantile_select(df, "score", q=0.75)
    assert sorted(r.doc_id for r in kept.collect()) == [4]


# --- global shuffle ---------------------------------------------------------


def test_global_shuffle_is_a_permutation(spark):
    from syslog_ng_spark.operators.sampling import global_shuffle

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = global_shuffle(df, "doc_id", 8, seed="s1")
    rows = out.collect()
    assert len(rows) == 1000
    # every row lands in exactly one shard; pos is 1..n contiguous per shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # roughly uniform (1000 over 8 shards; loose 3-sigma-ish bound)
    sizes = [len(v) for v in by_shard.values()]
    assert min(sizes) > 60 and max(sizes) < 200


def test_global_shuffle_deterministic_and_seed_sensitive(spark):
    from syslog_ng_spark.operators.sampling import global_shuffle

    df = spark.range(300).withColumnRenamed("id", "doc_id")
    a = {(r["doc_id"], r["shard"], r["pos"]) for r in global_shuffle(df, "doc_id", 4, "e0").collect()}
    b = {(r["doc_id"], r["shard"], r["pos"]) for r in global_shuffle(df, "doc_id", 4, "e0").collect()}
    c = {(r["doc_id"], r["shard"], r["pos"]) for r in global_shuffle(df, "doc_id", 4, "e1").collect()}
    assert a == b          # same seed -> identical permutation
    assert a != c          # new epoch seed -> a different permutation


def test_write_shuffled_shards_layout(spark, tmp_path):
    from syslog_ng_spark.operators.sampling import global_shuffle, write_shuffled_shards

    df = spark.range(400).withColumnRenamed("id", "doc_id")
    path = str(tmp_path / "shards")
    write_shuffled_shards(df, path, "doc_id", 4, seed="w")
    back = spark.read.parquet(path)
    assert back.count() == 400
    assert {r["shard"] for r in back.select("shard").distinct().collect()} == {0, 1, 2, 3}
    # file order inside a shard == shuffle order (parquet preserves row order)
    shard0 = [r["doc_id"] for r in back.where("shard = 0").collect()]
    expect = [
        r["doc_id"]
        for r in global_shuffle(df, "doc_id", 4, "w").where("shard = 0").orderBy("pos").collect()
    ]
    assert shard0 == expect


def test_quantile_select_approx_band(spark):
    """method='approx' (the 100 TB path) must select within the G-K
    sketch's rank-error band of the exact selection: with
    accuracy=10000 on n=2000 rows, rank error <= n/accuracy = 0.2
    rows -> the selections are IDENTICAL here; on ties the threshold
    may differ by at most one distinct score value."""
    from syslog_ng_spark.operators.sampling import quantile_select

    rows = [(i, "en" if i % 3 else "fr", float((i * 37) % 1000)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    exact = {
        r.doc_id for r in quantile_select(df, "score", "lang", q=0.7).collect()
    }
    approx = {
        r.doc_id
        for r in quantile_select(
            df, "score", "lang", q=0.7, method="approx", accuracy=10000
        ).collect()
    }
    sym = exact.symmetric_difference(approx)
    # rank error bound: <= ceil(n_group/accuracy) rows per group = 1
    assert len(sym) <= 2, f"approx selection drifted {len(sym)} rows"


def test_quantile_select_method_validation(spark):
    from syslog_ng_spark.operators.sampling import quantile_select

    df = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        quantile_select(df, "score", method="bogus")


def test_mixture_sample_budget_and_mixture(spark):
    """Token-budgeted mixture: per-source kept tokens track B*w_s
    within sampling noise, oversubscribed sources cap at keep-all,
    unweighted sources vanish, and the draw is salt-deterministic."""
    from syslog_ng_spark.operators.sampling import mixture_sample

    rows = []
    # big: 2000 docs x 100 tokens; small: 40 docs x 100 tokens; noise: unweighted
    for i in range(2000):
        rows.append((i, "big", 100))
    for i in range(2000, 2040):
        rows.append((i, "small", 100))
    for i in range(2040, 2140):
        rows.append((i, "noise", 100))
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    budget = 40_000
    out = mixture_sample(df, "source", {"big": 0.5, "small": 0.5}, budget, salt="t")
    got = {r["source"]: r["kept"] for r in
           out.groupBy("source").agg(F.sum("n_tokens").alias("kept")).collect()}
    assert "noise" not in got
    # small is oversubscribed (4k tokens < 20k target) -> keeps ALL
    assert got["small"] == 4000
    # big targets 20k of 200k tokens (rate 0.1): binomial noise ~ sqrt(2000*0.1)*100
    assert abs(got["big"] - 20_000) <= 4_000
    # deterministic: same salt = same set; different salt = different draw
    a = {r.doc_id for r in mixture_sample(
        df, "source", {"big": 1.0}, budget, salt="x").collect()}
    b = {r.doc_id for r in mixture_sample(
        df, "source", {"big": 1.0}, budget, salt="x").collect()}
    c = {r.doc_id for r in mixture_sample(
        df, "source", {"big": 1.0}, budget, salt="y").collect()}
    assert a == b and a != c


def test_mixture_sample_validation_and_floor(spark):
    from syslog_ng_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(1, "a", 1_000_000_000), (2, "b", 10)],
        "doc_id long, source string, n_tokens long",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mixture_sample(df, "source", {}, 100)
    with _pytest.raises(ValueError):
        mixture_sample(df, "source", {"a": 1.0}, 0)
    with _pytest.raises(ValueError):
        mixture_sample(df, "source", {"a": -1.0, "b": 2.0}, 100)
    # a positive target never rounds to rate 0: source 'a' is huge
    # (rate would quantize to 0 bp) but stays represented at 1 bp
    out = mixture_sample(df, "source", {"a": 0.5, "b": 0.5}, 20, salt="f")
    rates = out.select("source").distinct().collect()
    assert {r.source for r in rates} <= {"a", "b"}
