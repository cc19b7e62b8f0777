"""Interleaved A/B: embedded word_ngrams (pre-hoist) vs hoisted-words (live)
for bloom_decontaminate / decontaminate / hll_ngrams bench queries, one
session, cache cleared per arm.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_wordhoist.py [rounds]
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
    curation as C,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.persistpool import (  # noqa: E402
    persist_scan,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.spread import (  # noqa: E402
    spread_scan,
)


def old_decontaminate(train, eval_df, n=3, min_hits=1):
    eval_grams = (
        eval_df.select(F.explode(C.word_ngrams(F.col("text"), n)).alias("gram"))
        .distinct()
    )
    train_grams = train.select(
        F.col("doc_id"), F.explode(C.word_ngrams(F.col("text"), n)).alias("gram")
    )
    hits = (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    return (
        train.join(hits, "doc_id", "left")
        .withColumn("n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")))
        .withColumn("contaminated", (F.col("n_overlap") >= min_hits).cast("int"))
    )


def old_bloom(train, eval_df, n=3, m_bits=4096, h=3, min_hits=1):
    eval_grams = (
        eval_df.select(F.explode(C.word_ngrams(F.col("text"), n)).alias("gram"))
        .distinct()
    )
    bits = C.bloom_bits(eval_grams, "gram", m_bits, h)
    blit = F.expr("array(" + ",".join(str(b) for b in bits) + ")")

    def _passes(g):
        test = None
        for j in range(h):
            p = C.bloom_positions(g, j, m_bits)
            t = F.element_at(blit, (p + 1).cast("int")) == 1
            test = t if test is None else test & t
        return test

    grams = C.word_ngrams(F.col("text"), n)
    base = persist_scan(
        train.select(
            F.col("doc_id"),
            F.col("text"),
            F.size(F.filter(grams, _passes)).cast("long").alias("n_maybe"),
        )
    )
    flagged_grams = base.where(F.col("n_maybe") >= min_hits).select(
        F.col("doc_id"), F.explode(grams).alias("gram")
    )
    exact = (
        flagged_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    return (
        base.join(exact, "doc_id", "left")
        .select(
            F.col("doc_id"),
            F.col("n_maybe"),
            (F.col("n_maybe") >= min_hits).cast("int").alias("bloom_flagged"),
            F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")).alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_hits)
            .cast("int")
            .alias("contaminated"),
        )
    )


def old_hll(spark, sf_dir, n=3, p=8):
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.sketches import (
        _HLL_HASH_BITS,
        _hash60,
    )

    docs = entry_mod._t(spark, sf_dir, "documents")
    m = 1 << p
    w_bits = _HLL_HASH_BITS - p
    grams = (
        spread_scan(docs)
        .select(F.explode(C.word_ngrams(F.col("text"), n)).alias("gram"))
        .distinct()
    )
    h = _hash60(F.col("gram"))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits) - F.length(F.bin(w)) + 1
    )
    registers = (
        grams.select((h % m).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"), F.count("*").alias("_dc"))
    )
    k = w_bits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = float(1 << k)
    agg = registers.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {k} - rho)")).alias("s_present"),
        F.count("*").alias("n_present"),
        F.sum("_dc").cast("long").alias("n_exact"),
    )
    s_int = F.coalesce(F.col("s_present"), F.lit(0)) + (
        F.lit(m) - F.col("n_present")
    ) * F.lit(1 << k)
    v_zero = F.lit(m) - F.col("n_present")
    e_raw = F.lit(alpha * m * m) * F.lit(scale) / s_int.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        F.col("n_present").cast("long").alias("n_registers"),
        F.round(est, 4).alias("hll_estimate"),
        "n_exact",
        F.round(
            (F.round(est, 4) - F.col("n_exact")) / F.col("n_exact").cast("double") * 100.0, 2
        ).alias("rel_err_pct"),
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    def _fixture():
        d = entry_mod._docs_fanned(spark, sf_dir)
        train = d.where(F.col("doc_id") % 41 != 0).select("doc_id", "text")
        ev = d.where(F.col("doc_id") % 41 == 0)
        return train, ev

    arms = {
        "decon_old": lambda: old_decontaminate(*_fixture(), n=3, min_hits=2).select("doc_id", "n_overlap", "contaminated"),
        "decon_new": lambda: qs["decontaminate"](spark, sf_dir),
        "bloom_old": lambda: old_bloom(*_fixture(), n=3, m_bits=8192, h=3, min_hits=2),
        "bloom_new": lambda: qs["bloom_decontaminate"](spark, sf_dir),
        "hll_old": lambda: old_hll(spark, sf_dir),
        "hll_new": lambda: qs["hll_ngrams"](spark, sf_dir),
    }

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    res = {n: [] for n in arms}
    noop(qs["hll_ngrams"](spark, sf_dir))  # warmup
    out = open("/tmp/ab_wordhoist.out", "w")
    for r in range(rounds):
        for name, build in arms.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab {name} r{r}")
            t0 = time.perf_counter()
            noop(build())
            res[name].append(round(time.perf_counter() - t0, 3))
    for name, xs in res.items():
        print(name, xs, "best", min(xs), file=out)
    out.close()


if __name__ == "__main__":
    main()
