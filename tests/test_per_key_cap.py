"""per_key_cap (operators/training.py): exact per-domain cap in seeded
md5-hash order, computed WITHOUT a window over the raw domain key — the
data-side window partitions by (key, hash-bucket) so a hot domain never
serializes one sort task; buckets past the cap are pruned pre-window."""

from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.training import (
    _md5_rank_hash,
    per_key_cap,
)


def _brute(spark, df, cap):
    """Single-window reference implementation (what the oracle runs)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("k").orderBy(_md5_rank_hash("id", "cap"), "id")
    return {
        (r.k, r.id, r.cap_rank)
        for r in df.withColumn("cap_rank", F.row_number().over(w))
        .where(F.col("cap_rank") <= cap)
        .collect()
    }


def _skewed(spark):
    # one hot domain (200 rows), several cold ones (3 each), a NULL key
    rows = [(i, "hot") for i in range(200)]
    rows += [(1000 + 10 * d + j, f"cold{d}") for d in range(5) for j in range(3)]
    rows += [(9999, None), (None, "hot")]
    return spark.createDataFrame(rows, "id long, k string")


def test_matches_single_window_reference(spark):
    df = _skewed(spark)
    got = {
        (r.k, r.id, r.cap_rank)
        for r in per_key_cap(df, key="k", id_col="id", cap=7).collect()
    }
    assert got == _brute(spark, df.where(F.col("k").isNotNull() & F.col("id").isNotNull()), 7)
    assert len([1 for k, *_ in got if k == "hot"]) == 7
    assert all(r[0] != "hot" or r[2] <= 7 for r in got)


def test_cold_domains_under_cap_keep_everything(spark):
    got = per_key_cap(_skewed(spark), key="k", id_col="id", cap=7)
    cold = got.where(F.col("k").startswith("cold")).groupBy("k").count().collect()
    assert {r["count"] for r in cold} == {3} and len(cold) == 5


def test_deterministic_across_partitionings(spark):
    df = _skewed(spark)
    a = sorted(map(tuple, per_key_cap(df.repartition(1), key="k", id_col="id", cap=5).collect()))
    b = sorted(map(tuple, per_key_cap(df.repartition(13, "id"), key="k", id_col="id", cap=5).collect()))
    assert a == b


def test_null_key_and_id_excluded(spark):
    out = per_key_cap(_skewed(spark), key="k", id_col="id", cap=1000).collect()
    assert all(r.k is not None and r.id is not None for r in out)


def test_data_window_never_partitions_by_key_alone(spark):
    plan = (
        per_key_cap(_skewed(spark), key="k", id_col="id", cap=7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "row_number()" in line:
            # the rank window must include the hash bucket in its partition spec
            assert "_bk" in line, line


def test_bucket_shift_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        per_key_cap(_skewed(spark), key="k", id_col="id", cap=1, bucket_shift=60)
