#!/usr/bin/env python
"""Experiment (VERDICT r10 item 6): would a FIFTH shared materialized
stage — per-document whitespace tokens ``(doc_id, source, lang, toks)``
over ``documents`` — pay for itself for the four keys that re-split
``documents.text`` (corpus_cdc_chunks, text_token_count, text_tfidf,
corpus_bpe_merges)?

The §27 discipline: materialize only when the SHARED projection
dominates the consumers' cost. Unlike the four live stages (md5
shingle folds, trigram explodes, SQ8 quantization — heavy shared CPU),
the shared work here is ONE whitespace split. This script measures,
same-session alternating min-of-3 at the bench SF:

1. DOMINANCE BOUND: cost of scanning text + splitting vs cost of
   scanning the staged token arrays. The stage swaps exactly
   split-after-scan for stage-scan in every consumer, so if the staged
   scan is not substantially cheaper, no consumer can win.
2. Per-key A/B for the two heavy candidates (cdc chunking, tfidf) and
   the word-frequency-table fragment of bpe, plus the stage-plus-
   original-scan shape token_count would need (it reads raw ``text``
   for its subword regexp either way).

Run idle; prints one JSON line. Results recorded in SCALING.md §30.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from fitness_data_ingest_spark.ext.text import token_hashes, tokens  # noqa: E402
from fitness_data_ingest_spark.registry_util import t  # noqa: E402
from fitness_data_ingest_spark.session import get_spark  # noqa: E402

CDC_MASK = 64


def _cdc_from_staged(staged):
    """cdc_chunk_stats body downstream of the token split (mirrors
    ext/corpus.cdc_chunk_stats — duplicated HERE ONLY because the
    experiment must not touch library code unless it wins)."""
    staged = staged.filter(F.size("toks") > 0).withColumn(
        "hs", token_hashes(F.col("toks"))
    )
    n = F.size("toks")
    idx = F.sequence(F.lit(0), n - 1)
    bp = F.filter(
        idx,
        lambda j: (j == 0)
        | (F.element_at(F.col("hs"), (j + 1).cast("int")) % CDC_MASK == 0),
    )
    staged = staged.withColumn("bp", bp).withColumn(
        "ends",
        F.concat(F.slice(F.col("bp"), 2, F.size("bp") - 1), F.array(n)),
    )
    chunk_structs = F.zip_with(
        F.col("bp"),
        F.col("ends"),
        lambda s, e: F.struct(
            F.array_join(F.slice(F.col("toks"), s + 1, e - s), " ").alias("txt"),
            (e - s).cast("long").alias("n_tok"),
        ),
    )
    chunks = staged.select(
        "doc_id", "source", F.explode(chunk_structs).alias("c")
    ).select("doc_id", "source", F.md5("c.txt").alias("chunk_hash"), "c.n_tok")
    counts = chunks.groupBy("chunk_hash").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        chunks.join(counts, "chunk_hash")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("cnt") > 1).cast("long")).alias("n_dup_chunks"),
            F.sum("n_tok").alias("sum_tok"),
            F.sum(F.when(F.col("cnt") > 1, F.col("n_tok")).otherwise(0)).alias(
                "dup_tok"
            ),
            (
                F.floor(
                    F.sum(F.when(F.col("cnt") > 1, F.col("n_tok")).otherwise(0))
                    .cast("double")
                    / F.sum("n_tok").cast("double")
                    * 10000
                    + 0.5
                )
                / 10000.0
            ).alias("dup_rate4"),
        )
    )


def _tfidf_from_tok(tok, n_docs_df, min_df=2):
    tf = tok.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf_raw"))
    doc_len = tf.groupBy("doc").agg(F.sum("tf_raw").alias("len"))
    df_tbl = (
        tf.groupBy("term")
        .agg(F.countDistinct("doc").alias("df"))
        .filter(F.col("df") >= min_df)
    )
    out = (
        tf.join(F.broadcast(df_tbl), "term")
        .join(doc_len, "doc")
        .crossJoin(F.broadcast(n_docs_df))
        .withColumn(
            "tfidf",
            (F.col("tf_raw").cast("double") / F.col("len"))
            * F.log((F.col("_n_docs") + 1.0) / (F.col("df").cast("double") + 1.0)),
        )
    )
    return out.select(
        "doc", "term", "tf_raw", "df",
        (F.floor(F.col("tfidf") * 1e8 + 0.5) / 1e8).alias("tfidf8"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="fdis-exp-token-stage",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    n_parts = max(spark.sparkContext.defaultParallelism, 1)
    stage_path = os.path.join("/tmp", f"fdis_{os.getpid()}_exp_toks.parquet")

    def run(df):
        df.write.mode("overwrite").format("noop").save()

    def timeit(builder, reps=3):
        best = float("inf")
        for _ in range(reps):
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            run(builder())
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    docs = lambda: t(spark, sf_dir, "documents")  # noqa: E731

    # --- stage build (timed once, like shared_stages_sec) ---
    t0 = time.perf_counter()
    (
        docs()
        .repartition(n_parts, F.col("doc_id"))
        .select("doc_id", "source", "lang", tokens(F.col("text")).alias("toks"))
        .write.mode("overwrite")
        .parquet(stage_path)
    )
    build_sec = round(time.perf_counter() - t0, 3)
    stage = lambda: spark.read.parquet(stage_path)  # noqa: E731

    results = {"sf_dir": sf_dir, "stage_build_sec": build_sec}

    # --- 1. dominance bound ---
    pairs = {
        "split_from_text": lambda: docs().select(
            "doc_id", "source", "lang", tokens(F.col("text")).alias("toks")
        ),
        "scan_staged_toks": lambda: stage(),
    }
    # alternate variants min-of-3 in one sitting
    for name, b in pairs.items():
        results[name] = timeit(b)

    # --- 2. per-key A/B (current vs staged), alternating ---
    def cdc_current():
        from fitness_data_ingest_spark.ext.corpus import cdc_chunk_stats

        return cdc_chunk_stats(docs())

    def cdc_staged():
        return _cdc_from_staged(stage().select("doc_id", "source", "toks"))

    def tfidf_current():
        from fitness_data_ingest_spark.ext.text import tfidf

        return tfidf(docs(), "doc_id", "text", min_df=2)

    def tfidf_staged():
        s = stage()
        tok = s.select(
            F.col("doc_id").alias("doc"), F.explode("toks").alias("term")
        )
        n_docs_df = s.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
        return _tfidf_from_tok(tok, n_docs_df)

    def bpe_words_current():
        return (
            docs()
            .select(F.col("text").alias("_t"))
            .repartition(n_parts)
            .select(F.explode(tokens(F.col("_t"))).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def bpe_words_staged():
        return (
            stage()
            .select(F.explode("toks").alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def tokcount_current():
        toks_c = tokens(F.col("text"))
        from fitness_data_ingest_spark.registry_ext import BPEISH_PATTERN

        return docs().select(
            "doc_id",
            F.size(toks_c).alias("n_tokens"),
            F.size(F.array_distinct(toks_c)).alias("n_distinct_tokens"),
            F.size(
                F.regexp_extract_all("text", F.lit(BPEISH_PATTERN), 0)
            ).alias("n_subwords"),
            F.length("text").alias("n_chars_c"),
        )

    def tokcount_staged():
        from fitness_data_ingest_spark.registry_ext import BPEISH_PATTERN

        lhs = stage().select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.size(F.array_distinct("toks")).alias("n_distinct_tokens"),
        )
        rhs = docs().select(
            "doc_id",
            F.size(
                F.regexp_extract_all("text", F.lit(BPEISH_PATTERN), 0)
            ).alias("n_subwords"),
            F.length("text").alias("n_chars_c"),
        )
        return lhs.join(rhs, "doc_id")

    ab = {
        "corpus_cdc_chunks": (cdc_current, cdc_staged),
        "text_tfidf": (tfidf_current, tfidf_staged),
        "bpe_words_table": (bpe_words_current, bpe_words_staged),
        "text_token_count": (tokcount_current, tokcount_staged),
    }
    for key, (cur, stg) in ab.items():
        times = {"current": [], "staged": []}
        for rep in range(3):
            order = (
                [("current", cur), ("staged", stg)]
                if rep % 2 == 0
                else [("staged", stg), ("current", cur)]
            )
            for label, b in order:
                try:
                    spark._jvm.System.gc()
                except Exception:
                    pass
                spark.catalog.clearCache()
                t1 = time.perf_counter()
                run(b())
                times[label].append(time.perf_counter() - t1)
        results[key] = {
            "current_sec": round(min(times["current"]), 3),
            "staged_sec": round(min(times["staged"]), 3),
        }

    print(json.dumps(results, sort_keys=True))
    import shutil

    shutil.rmtree(stage_path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
