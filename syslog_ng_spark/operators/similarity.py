"""Similarity search over embedding columns (LLM-pipeline extension).

Brute-force cosine top-k is the correctness baseline; the scale path
is LSH bucketing (random-hyperplane signs) so candidate generation is
linear. Vector math uses JVM array functions (zip_with + aggregate in
double precision) — deterministic sequential order, reproducible in
the DuckDB oracle. A numpy Pandas-UDF variant exists for when the
corpus side is large enough that Arrow-batch matmul wins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (single-row) query side,
    score every corpus vector, take k. Ties broken by id; scores
    rounded to 6 digits so ordering is engine-portable."""
    q = F.broadcast(
        query.select(F.col(vec_col).alias("_qvec"), norm(F.col(vec_col)).alias("_qn"))
    )
    scored = corpus.crossJoin(q).select(
        F.col(id_col),
        F.round(
            dot(F.col(vec_col), F.col("_qvec")) / (norm(F.col(vec_col)) * F.col("_qn")), 6
        ).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def cosine_topk_pandas(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Arrow-batched numpy variant: per-partition matmul then global
    top-k. Preferred at scale — one pass, no per-row lambda overhead."""
    import numpy as np
    import pandas as pd

    q = np.asarray(query_vec, dtype="float64")
    qn = np.linalg.norm(q)

    def score(iterator):
        for pdf in iterator:
            mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * qn)
            out = pd.DataFrame({id_col: pdf[id_col], "cos_sim": np.round(sims, 6)})
            yield out.nlargest(min(k, len(out)), "cos_sim")

    partial = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"{id_col} long, cos_sim double"
    )
    return partial.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def lsh_buckets(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    target: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign bits against fixed planes.
    ANN then only scores within the query's bucket (plus neighbors) —
    the linear-candidate scale path for 100 TB corpora."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    return df.withColumn(target, sum(bits[1:], bits[0]).cast("int"))
