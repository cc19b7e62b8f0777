"""P7 class-balanced sampling (distributed exact hash rank), S3 CCNet JSONL
scan, and the F7 CSV-compat JSON export edge."""

import json

import pytest
from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.functions.jsonio import (
    export_csv_compat,
    import_csv_compat,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.parse import (
    TERNARY_T,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.training import (
    class_balanced_pairs,
    hash_balanced_sample,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.sources.ccnet import (
    ccnet_to_docs,
    read_ccnet_jsonl,
)


# --- balanced sampling --------------------------------------------------------

@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(f"p{i:04d}", "沒有" if i % 7 else "親屬") for i in range(700)]
    return spark.createDataFrame(rows, "pair_id string, re_label string").cache()


def test_balanced_counts(spark, labeled):
    bal = class_balanced_pairs(labeled)
    counts = {
        r["re_label"]: r["n"]
        for r in bal.groupBy("re_label").agg(F.count("*").alias("n")).collect()
    }
    assert counts["親屬"] == 100
    assert counts["沒有"] == 100


def test_balanced_deterministic_under_partitioning(spark, labeled):
    a = set(r["pair_id"] for r in class_balanced_pairs(labeled.repartition(1)).collect())
    b = set(r["pair_id"] for r in class_balanced_pairs(labeled.repartition(13)).collect())
    assert a == b and len(a) == 200


def test_balanced_no_negatives_edge(spark):
    df = spark.createDataFrame([("a", "親屬")], "pair_id string, re_label string")
    assert class_balanced_pairs(df).count() == 1


def test_balanced_null_keys_excluded(spark):
    """NULL keys cannot be hash-ranked: they are excluded from the negative
    sample (documented contract) instead of crashing the bucket map."""
    rows = [("a", "親屬"), ("b", "沒有"), (None, "沒有"), ("c", "沒有")]
    df = spark.createDataFrame(rows, "pair_id string, re_label string")
    bal = class_balanced_pairs(df).collect()
    keys = {r["pair_id"] for r in bal}
    assert None not in keys
    assert sum(1 for r in bal if r["re_label"] == "沒有") == 1


def test_balanced_matches_global_sort_rank(spark, labeled):
    """The two-phase bucketed rank equals the straight global-window rank
    (the single-partition formulation the SQL oracle uses)."""
    from pyspark.sql.window import Window

    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.training import (
        _md5_rank_hash,
    )

    neg = labeled.where(F.col("re_label") == "沒有")
    n_pos = labeled.where(F.col("re_label") != "沒有").count()
    w = Window.orderBy(_md5_rank_hash("pair_id", "22"), "pair_id")
    want = set(
        r["pair_id"]
        for r in neg.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= n_pos)
        .collect()
    )
    got = set(
        r["pair_id"]
        for r in hash_balanced_sample(
            labeled, F.col("re_label") != "沒有", key="pair_id", seed="22"
        )
        .where(F.col("re_label") == "沒有")
        .collect()
    )
    assert got == want


# --- CCNet JSONL scan ---------------------------------------------------------

def test_read_ccnet_jsonl(spark, tmp_path):
    lines = [
        {"url": "https://a/1", "title": "t1", "raw_content": "陳大文是陳小明的長子。"},
        {"url": "https://a/2", "title": "t2", "raw_content": "The committee met and discussed the budget."},
    ]
    p = tmp_path / "shard.jsonl"
    with open(p, "w", encoding="utf-8") as f:
        for line in lines:
            f.write(json.dumps(line, ensure_ascii=False) + "\n")
        f.write("{not valid json\n")  # malformed line must be dropped

    df = read_ccnet_jsonl(spark, str(p))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"https://a/1", "https://a/2"}
    assert rows["https://a/1"]["raw_content"] == "陳大文是陳小明的長子。"

    docs = ccnet_to_docs(df)
    langs = {r["url"]: r["lang"] for r in docs.collect()}
    assert langs["https://a/1"] == "zh"
    assert langs["https://a/2"] == "en"


# --- F7 CSV-compat export edge -------------------------------------------------

def test_json_export_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("u1", [("陳大文", "陳小明", "親屬")]), ("u2", [])],
        f"url string, merge_label {TERNARY_T.replace('array', 'array', 1)}",
    )
    exported = export_csv_compat(df, ["merge_label"])
    assert dict(exported.dtypes)["merge_label"] == "string"
    cell = exported.where(F.col("url") == "u1").collect()[0]["merge_label"]
    assert "陳大文" in cell  # raw UTF-8, not \u escapes (ensure_ascii=False)
    # survives an actual CSV file round trip
    out = str(tmp_path / "export_csv")
    exported.write.mode("overwrite").option("header", True).csv(out)
    back_raw = spark.read.option("header", True).csv(out)
    back = import_csv_compat(back_raw, {"merge_label": TERNARY_T})
    got = {r["url"]: r["merge_label"] for r in back.collect()}
    assert [tuple(t) for t in got["u1"]] == [("陳大文", "陳小明", "親屬")]
    assert got["u2"] == []
