"""Incremental KG maintenance end-to-end: new web pages arrive, only the
NEW urls are extracted (resume_filter anti-join against the processed-urls
stage), the triple table is committed as a NEW snapshot in the catalog
chain, the incremental result equals a from-scratch run, snapshot_diff
reports pure additions, and time-travel still serves the old snapshot —
the full "10^12-doc corpus grows daily" maintenance loop at test scale."""

from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.snapshot import (
    snapshot_diff,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.plans.pipeline import (
    extract_triples,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.sources.catalog import (
    StageCatalog,
    resume_filter,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.sources.corpus import (
    generate_corpus,
)


def _tset(df):
    return sorted(
        (r["url"], r["subj"], r["obj"], r["rel"])
        for r in df.select("url", "subj", "obj", "rel").collect()
    )


def test_incremental_extract_matches_full_run(spark, tmp_path):
    cat = StageCatalog(str(tmp_path / "cat"))

    # day 1: 80 docs, full extract, commit triples + processed-url ledger
    day1 = generate_corpus(spark, 80, seed=42)
    t1 = extract_triples(day1)
    s1 = cat.write_stage(t1, "triples")
    cat.write_stage(day1.select("url"), "processed")

    # day 2: corpus grows to 120 docs (deterministic generator → the first
    # 80 are byte-identical); only the 40 new urls may be extracted
    day2 = generate_corpus(spark, 120, seed=42)
    fresh = resume_filter(day2, cat, "processed", key="url")
    assert fresh.count() == 40

    t_new = extract_triples(fresh)
    merged = cat.read_stage(spark, "triples").unionByName(t_new)
    s2 = cat.write_stage(merged, "triples")
    cat.write_stage(day2.select("url"), "processed")

    # incremental == from-scratch (extraction is url-local, so processing
    # only the delta must lose nothing)
    assert _tset(cat.read_stage(spark, "triples")) == _tset(extract_triples(day2))

    # the diff between the two snapshots is pure addition
    key = ["url", "subj", "obj", "rel"]
    d = snapshot_diff(
        cat.read_stage(spark, "triples", as_of=s1),
        cat.read_stage(spark, "triples", as_of=s2),
        keys=key,
        compare=[],
    )
    by_status = {r["status"]: r["n"] for r in d.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert by_status.get("removed", 0) == 0 and by_status.get("changed", 0) == 0
    assert by_status.get("added", 0) == t_new.count() > 0

    # time-travel: day-1 consumers still see exactly the day-1 table
    assert _tset(cat.read_stage(spark, "triples", as_of=s1)) == _tset(t1)
