"""Interleaved A/B: minhash signature with the embedded (r6-session-2)
shingle-hash transform vs the hoisted-hash-array form (live operator), on
the two bench minhash queries, one session, cache cleared per arm.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_minhash_hoist.py [rounds]
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
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators import (  # noqa: E402
    dedup as D,
)


def old_minhash_lsh_pairs(docs, n=3, k=8, bands=None, threshold=0.6, verify="auto"):
    """r6-session-2 shape: identical to D.minhash_lsh_pairs except the
    signature embeds the hash transform k times (the pre-hoist base)."""
    if bands is None:
        bands, _ = D.lsh_params(threshold, k)
    rows_per_band = k // bands
    base = docs.select(
        F.col("doc_id").alias("id"), D.char_shingles(F.col("text"), n).alias("sh")
    ).withColumn(
        "sig",
        D.minhash_signature_from_hashes(
            F.transform(F.col("sh"), D.shingle_hash), k
        ),
    )
    base = D._persist_scan(base)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.slice("sig", b * rows_per_band + 1, rows_per_band).alias("bsig"),
        )
        for b in range(bands)
    ]
    buckets = base.select("id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.bsig").alias("bsig")
    )
    left, right = buckets.alias("l"), buckets.alias("r")
    cand = (
        left.join(right, on=["band", "bsig"])
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a_id"), F.col("r.id").alias("b_id"))
        .distinct()
    )
    sh_flat = base.select(F.col("id"), F.explode("sh").alias("s"))
    vocab: list[str] = []
    if verify == "auto":
        vocab = [
            r["s"] for r in sh_flat.select("s").distinct().limit(4097).collect()
        ]
        verify = "dense" if 0 < len(vocab) <= 4096 else "inverted"
    if verify == "dense":
        masks, n_words = D._dense_masks(sh_flat.select("id", F.col("s").alias("sh")), vocab, [])
        joined = (
            cand.join(masks.alias("a"), cand.a_id == F.col("a.id"))
            .join(masks.alias("b"), cand.b_id == F.col("b.id"))
            .select(
                "a_id", "b_id",
                D._popcount_common(n_words).alias("n_common"),
                F.col("a.n_sh").alias("a_sz"),
                F.col("b.n_sh").alias("b_sz"),
            )
        )
        return D._jaccard_select(joined, threshold)
    a_sh = sh_flat.select(F.col("id").alias("a_id"), F.col("s"))
    b_sh = sh_flat.select(F.col("id").alias("b_id"), F.col("s"))
    n_common = (
        cand.join(a_sh, "a_id")
        .join(b_sh, ["b_id", "s"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_common"))
    )
    sizes = base.select("id", F.size("sh").alias("n_sh"))
    return D._jaccard_from_counts(n_common, sizes, threshold)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    arms = {
        "lsh_old": lambda: old_minhash_lsh_pairs(
            entry_mod._docs_fanned(spark, sf_dir), n=3, k=8, threshold=0.7
        ),
        "lsh_new": lambda: entry_mod.queries()["minhash_lsh"](spark, sf_dir),
        "inv_old": lambda: old_minhash_lsh_pairs(
            entry_mod._open_vocab_docs(spark, sf_dir).withColumnRenamed(
                "doc_id", "doc_id"
            ),
            n=3, k=8, threshold=0.8, verify="inverted",
        ),
        "inv_new": lambda: entry_mod.queries()["minhash_lsh_inverted"](spark, sf_dir),
    }
    res = {n: [] for n in arms}
    noop(arms["lsh_new"]())  # warmup
    for r in range(rounds):
        for name, build in arms.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab {name} r{r}")
            res[name].append(t(lambda: noop(build())))
    for name, xs in res.items():
        print(name, xs, "best", min(xs))


if __name__ == "__main__":
    main()
