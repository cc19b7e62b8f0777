"""Probe the duplicated-subexpression HOF patterns (minhash's md5-per-
permutation bug, generalized): for each site, time the current shape vs a
words/hashes-hoisted shape, interleaved, cache-cleared, noop sink.

  ngrams_cur / ngrams_hoist   word_ngrams: split(trim(text)) inside the
                              per-element lambda vs hoisted words column
  simhash_cur / simhash_hoist 16 per-bit aggregates each embedding the
                              char_shingles+md5 transform vs hoisted hashes
  bm25feat_cur / bm25feat_hoist  per-term tf filters each embedding the
                              split+lower+filter words vs hoisted ws
  dsir_cur / dsir_hoist       feature_buckets' 4 embedded ws copies vs
                              hoisted ws

Usage: SPARK_GRAFT_SF_DIR=... python scripts/probe_hoist_patterns.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from research_on_document_level_person_relation_extraction_in_chinese_spark import (  # noqa: E402
    get_spark,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.curation import (  # noqa: E402
    word_ngrams,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup import (  # noqa: E402
    char_shingles,
    shingle_hash,
    simhash,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dsir import (  # noqa: E402
    WORD_SPLIT,
    feature_buckets,
)


def _wng_from_words(words, n=3):
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    return F.array_distinct(
        F.when(F.size(words) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def _simhash_from_hashes(hashes, bits=16):
    def _bit_weight(j):
        return lambda acc, h: acc + (
            (F.floor(h / F.lit(float(1 << j))).cast("long") % 2) * 2 - 1
        )

    out = F.lit(0).cast("long")
    for j in range(bits):
        weight = F.aggregate(hashes, F.lit(0).cast("long"), _bit_weight(j))
        out = out + F.when(weight > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def _fb_from_ws(ws, n_buckets=512):
    n = F.size(ws)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(ws, 1, n - 1),
            F.slice(ws, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(ws, bigrams)
    return F.transform(grams, lambda g: shingle_hash(g) % n_buckets)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = entry_mod._docs_fanned(spark, sf_dir)
    terms = ["the", "of", "data", "model", "quality", "web"]

    def ngrams_cur():
        return docs.select(F.explode(word_ngrams(F.col("text"), 3)).alias("g"))

    def ngrams_hoist():
        return (
            docs.select(F.split(F.trim(F.col("text")), "\\s+").alias("_w"))
            .select(F.explode(_wng_from_words(F.col("_w"), 3)).alias("g"))
        )

    def simhash_cur():
        return docs.select("doc_id", simhash(F.col("text"), bits=16).alias("h"))

    def simhash_hoist():
        return (
            docs.select(
                "doc_id",
                F.transform(char_shingles(F.col("text"), 2), shingle_hash).alias("_hv"),
            )
            .select("doc_id", _simhash_from_hashes(F.col("_hv"), 16).alias("h"))
        )

    def _ws(text):
        return F.filter(F.split(F.lower(text), WORD_SPLIT), lambda w: w != "")

    def _tf(ws, term):
        return F.size(F.filter(ws, lambda w: w == F.lit(term)))

    def bm25feat_cur():
        ws = _ws(F.col("text"))
        return docs.select(
            "doc_id",
            F.size(ws).alias("dl"),
            *[_tf(ws, t).cast("double").alias(f"tf{i}") for i, t in enumerate(terms)],
        )

    def bm25feat_hoist():
        return docs.select("doc_id", _ws(F.col("text")).alias("_w")).select(
            "doc_id",
            F.size("_w").alias("dl"),
            *[
                _tf(F.col("_w"), t).cast("double").alias(f"tf{i}")
                for i, t in enumerate(terms)
            ],
        )

    def dsir_cur():
        return docs.select("doc_id", feature_buckets(F.col("text"), 512).alias("fb"))

    def dsir_hoist():
        return docs.select("doc_id", _ws(F.col("text")).alias("_w")).select(
            "doc_id", _fb_from_ws(F.col("_w"), 512).alias("fb")
        )

    arms = {
        "ngrams_cur": ngrams_cur,
        "ngrams_hoist": ngrams_hoist,
        "simhash_cur": simhash_cur,
        "simhash_hoist": simhash_hoist,
        "bm25feat_cur": bm25feat_cur,
        "bm25feat_hoist": bm25feat_hoist,
        "dsir_cur": dsir_cur,
        "dsir_hoist": dsir_hoist,
    }

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    res = {n: [] for n in arms}
    noop(ngrams_cur())  # warmup
    for r in range(rounds):
        for name, build in arms.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"probe {name} r{r}")
            t0 = time.perf_counter()
            noop(build())
            res[name].append(round(time.perf_counter() - t0, 3))
    for name, xs in res.items():
        print(name, xs, "best", min(xs))

    # value identity checks
    for a, b, key in [
        (ngrams_cur(), ngrams_hoist(), "g"),
        (simhash_cur(), simhash_hoist(), "h"),
        (bm25feat_cur(), bm25feat_hoist(), "dl"),
        (dsir_cur(), dsir_hoist(), "fb"),
    ]:
        d = a.exceptAll(b).count() + b.exceptAll(a).count()
        print("diff", key, d)


if __name__ == "__main__":
    main()
