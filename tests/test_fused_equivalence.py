"""The fused pipeline nodes (operators/fused.py) must be semantically
identical to the unfused single-concern operators (annotate/parse/consensus).
"""

import pytest
from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.annotate import (
    annotate,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.consensus import (
    consensus_stage,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.fused import (
    annotate_parse_stage,
    fused_consensus_stage,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.parse import (
    parse_stage,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.taxonomy import (
    build_taxonomy,
    remap_relations,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.sources.corpus import (
    generate_corpus,
)

N = 150


@pytest.fixture(scope="module")
def zh_docs(spark):
    return (
        generate_corpus(spark, N, seed=42)
        .filter(F.col("lang") == "zh")
        .select("url", "text")
        .cache()
    )


def _consensus_rows(df):
    rows = df.select("url", "consensus_label", "gemini_verify_error").collect()
    return sorted(
        (
            r["url"],
            tuple(sorted((t["subj"], t["obj"], t["rel"]) for t in r["consensus_label"])),
            r["gemini_verify_error"],
        )
        for r in rows
    )


def test_fused_matches_unfused(spark, zh_docs):
    unfused_parsed = parse_stage(annotate(zh_docs))
    fused_parsed = annotate_parse_stage(zh_docs)

    cols = ["url", "gemini_has_relation", "gpt_has_relation", "gemini_ternary", "gpt_ternary"]
    a = sorted(map(repr, unfused_parsed.select(cols).collect()))
    b = sorted(map(repr, fused_parsed.select(cols).collect()))
    assert a == b

    tax = build_taxonomy(fused_parsed)
    assert tax == build_taxonomy(unfused_parsed)

    unfused_cons = consensus_stage(remap_relations(unfused_parsed, tax))
    fused_cons = fused_consensus_stage(remap_relations(fused_parsed, tax))
    assert _consensus_rows(unfused_cons) == _consensus_rows(fused_cons)
