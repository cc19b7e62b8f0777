"""CCNet-style global paragraph dedup (operators/dedup.py:paragraph_dedup):
first corpus-wide occurrence of a normalized paragraph wins, later copies
drop, short paragraphs always survive, doc text is rebuilt in order.
Reference lineage: SURVEY §1.3 — the production zh corpus was produced by
CCNet's SHA-1 paragraph dedup before any extraction ran."""

from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup import (
    paragraph_dedup,
)

A = "aaaa aaaa aa"  # 12 chars, long
B = "BBBB BBBB BB"
C = "cccc cccc cc"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = paragraph_dedup(df, **kw).collect()
    return {r.doc_id: (r.text, r.n_kept, r.n_dropped) for r in out}


def test_first_occurrence_wins_and_short_survives(spark):
    got = _run(
        spark,
        [
            (1, f"hi\n{A}\n{B}"),
            (2, f"{A}\n{C}\nhi"),
            (3, "bbbb bbbb bb"),  # case-normalized dup of doc 1's B
        ],
    )
    assert got[1] == (f"hi\n{A}\n{B}", 3, 0)  # all first occurrences
    assert got[2] == (f"{C}\nhi", 2, 1)  # A dropped, short 'hi' kept again
    assert got[3] == ("", 0, 1)  # entire doc was duplicate → empty text


def test_within_doc_duplicates_keep_first(spark):
    got = _run(spark, [(7, f"{A}\n{A}\n{A}")])
    assert got[7] == (A, 1, 2)


def test_order_preserved_after_drops(spark):
    got = _run(spark, [(1, f"{B}"), (2, f"{A}\n{B}\n{C}")])
    assert got[2] == (f"{A}\n{C}", 2, 1)


def test_min_chars_gate(spark):
    # With min_chars=1 even 'hi' dedups globally.
    got = _run(spark, [(1, f"hi\n{A}"), (2, f"hi\n{C}")], min_chars=1)
    assert got[1] == (f"hi\n{A}", 2, 0)
    assert got[2] == (C, 1, 1)


def test_normalization_lower_trim(spark):
    got = _run(spark, [(1, f"  {A.upper()}  "), (2, A)])
    assert got[1][1] == 1 and got[2] == ("", 0, 1)


def test_counts_are_consistent(spark):
    rows = [(i, f"#{i % 3}\n{A}\n{B if i % 2 else C}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = paragraph_dedup(df)
    tot = out.agg(
        F.sum("n_kept").alias("k"), F.sum("n_dropped").alias("d")
    ).collect()[0]
    n_paras = df.select(
        F.sum(F.size(F.split("text", "\n", -1))).alias("n")
    ).collect()[0].n
    assert tot.k + tot.d == n_paras
    # exactly 3 long paragraphs are unique corpus-wide (A, B, C)
    assert tot.d == n_paras - 10 - 3  # 10 short headers + 3 kept long
