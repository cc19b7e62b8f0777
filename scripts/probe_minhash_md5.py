"""Probe: is the md5 shingle-hash transform inside minhash_signature
re-evaluated once PER permutation (k times) because the common HOF
subexpression is not eliminated?  Times, in one session with cache
clearing and alternation:

  cur_k8   current minhash_signature, k=8          (8 embedded transforms)
  cur_k1   current minhash_signature, k=1          (1 embedded transform)
  hoist_k8 hashes materialised as their own column, k=8 mins read it

If cur_k8 ~ 8x the md5 share of cur_k1 and hoist_k8 ~ cur_k1 + epsilon,
the md5 pass is being duplicated per permutation.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/probe_minhash_md5.py [rounds]
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
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup import (  # noqa: E402
    HASH_MOD,
    MINHASH_SALTS,
    _permute,
    char_shingles,
    minhash_signature,
    shingle_hash,
)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = get_spark()
    docs = entry_mod._docs_fanned(spark, sf_dir)

    def cur(k: int):
        return docs.select(
            F.col("doc_id").alias("id"), char_shingles(F.col("text"), 3).alias("sh")
        ).withColumn("sig", minhash_signature(F.col("sh"), k))

    def hoisted(k: int):
        base = docs.select(
            F.col("doc_id").alias("id"), char_shingles(F.col("text"), 3).alias("sh")
        ).withColumn("hv", F.transform(F.col("sh"), shingle_hash))
        mins = [
            F.coalesce(
                F.array_min(F.transform(F.col("hv"), _permute(a, b))), F.lit(HASH_MOD)
            )
            for a, b in MINHASH_SALTS[:k]
        ]
        return base.withColumn("sig", F.array(*mins)).drop("hv")

    arms = {
        "cur_k8": lambda: cur(8),
        "cur_k1": lambda: cur(1),
        "hoist_k8": lambda: hoisted(8),
    }
    res = {n: [] for n in arms}
    noop(cur(8))  # warmup
    for r in range(rounds):
        for name, build in arms.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"probe {name} r{r}")
            res[name].append(t(lambda: noop(build())))
    for name, xs in res.items():
        print(name, xs, "best", min(xs))
    # sanity: same signatures either way
    a = cur(8).select("id", "sig").orderBy("id")
    b = hoisted(8).select("id", "sig").orderBy("id")
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print("sig diff rows:", diff)


if __name__ == "__main__":
    main()
