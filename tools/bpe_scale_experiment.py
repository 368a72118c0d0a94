"""BPE segmentation kernels at scale (r6 task 1).

The gate corpus trains 8 merges; a real tokenizer carries ~30k. This
experiment measures the production question: which bpe_segment kernel
survives a big merge list?

- kernel='expr' chains one literal replace PER MERGE into a single
  column expression — the repo's janino measurements (SCALE.md
  Addendum 5 §3) predict a compile wall past a few dozen terms.
- kernel='pandas' is the Arrow mapInPandas rank-priority encoder with
  a per-partition word memo — cost ~ O(distinct words x word len),
  independent of row repetition (Zipf does the heavy lifting).

The stock synthetic documents carry a 31-word vocabulary (the known
degenerate regime, SCALE.md §4) — far too small to exercise a merge
list. We synthesize a hashed-word corpus from doc_ids instead:
40 words/doc drawn deterministically from a ~50k-word md5-fragment
vocabulary (alphabet = hex, mean word len 6), the same
derive-from-parquet convention the other scale experiments use.

Usage: python tools/bpe_scale_experiment.py OUT.json SF_DIR [SF_DIR ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from syslog_ng_spark.session import get_session  # noqa: E402
from syslog_ng_spark.operators.bpe import bpe_segment, bpe_train  # noqa: E402

VOCAB = 50021  # prime: doc_id mixing covers the space uniformly
WORDS_PER_DOC = 40
N_MERGES_BIG = 500
N_MERGES_SMALL = 8


def hashed_corpus(spark, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    word = lambda i: F.substring(  # noqa: E731
        F.md5(((F.col("doc_id") * WORDS_PER_DOC + i * 7919) % VOCAB).cast("string")),
        1,
        4 + (F.col("doc_id") + i) % 5,
    )
    text = F.array_join(
        F.array(*[word(i) for i in range(WORDS_PER_DOC)]), " "
    ).alias("text")
    return docs.select("doc_id", text)


def timed(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 2)


def main() -> None:
    out_path, sf_dirs = sys.argv[1], sys.argv[2:]
    spark = get_session()
    results: dict = {"vocab": VOCAB, "words_per_doc": WORDS_PER_DOC}

    train_dir = sf_dirs[0]
    corpus = hashed_corpus(spark, train_dir).persist()
    corpus.count()
    t0 = time.monotonic()
    merges = bpe_train(corpus, "text", n_merges=N_MERGES_BIG)
    results["train_500_s"] = round(time.monotonic() - t0, 2)
    results["n_merges_trained"] = len(merges)
    print(f"train_500_s {results['train_500_s']}", flush=True)
    corpus.unpersist()

    for sf_dir in sf_dirs:
        name = Path(sf_dir).name
        c = hashed_corpus(spark, sf_dir).persist()
        n_docs = c.count()
        row: dict = {"docs": n_docs}

        def run(kernel: str, m: list) -> None:
            (
                bpe_segment(c, "text", m, kernel=kernel)
                .select(F.sum(F.size("bpe")))
                .collect()
            )

        # pandas first, expr last, partial JSON after every number: the
        # expr runs are the slow/fragile ones (straggler skew on long
        # docs, minutes per attempt at sf10), and a cut experiment must
        # keep everything measured before the cut
        def record(key: str, fn, runs: int = 2) -> None:
            row[key] = timed(fn, runs=runs)
            results[name] = row
            Path(out_path).write_text(json.dumps(results, indent=2))
            print(f"{name} {key}={row[key]}", flush=True)

        record("pandas_500_s", lambda: run("pandas", merges))
        record("pandas_8_s", lambda: run("pandas", merges[:N_MERGES_SMALL]))
        record("expr_8_s", lambda: run("expr", merges[:N_MERGES_SMALL]))
        record("expr_64_s", lambda: run("expr", merges[:64]), runs=1)
        if name == Path(train_dir).name:
            # the wall probe: one attempt, wall-clocked, failure recorded
            t0 = time.monotonic()
            try:
                run("expr", merges)
                row["expr_500_s"] = round(time.monotonic() - t0, 2)
            except Exception as exc:  # noqa: BLE001
                row["expr_500_s"] = None
                row["expr_500_error"] = f"{type(exc).__name__}: {str(exc)[:300]}"
                row["expr_500_wall_s"] = round(time.monotonic() - t0, 2)
        results[name] = row
        c.unpersist()
        spark.catalog.clearCache()
        print(name, row, flush=True)

    Path(out_path).write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
