"""Detection/annotation stage (SURVEY §2.7 M1–M4).

The reference calls an LLM once per document with the detection prompt and
fans out over API-key threads (``CommonCrawl/multi_thread_gemini_api.py:46-58``)
— its manual ``repartition(n) + mapPartitions``. Here the batched scorer runs
inside ``mapInPandas``: one Arrow batch in, one out, no per-row Python at the
Spark boundary, and parallelism is just partition count (1000 executors at
100 TB, 32 threads locally).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..scorers import get_scorer

ANNOTATORS = ("gemini", "gpt")


def annotate(docs: DataFrame, annotators=ANNOTATORS, scorer: str = "deterministic") -> DataFrame:
    """docs(url, text, ...) → + {ann}_has_relation, {ann}_output per annotator.

    Both annotators run in the SAME pass over each Arrow batch — one scan,
    zero joins/shuffles (the reference runs them as two sequential full-table
    passes; semantics identical, cost halved).
    """
    mod = get_scorer(scorer)
    in_cols = docs.columns
    out_schema = ", ".join(
        [f"`{c}` {docs.schema[c].dataType.simpleString()}" for c in in_cols]
        + [f"{a}_has_relation string, {a}_output string" for a in annotators]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for ann in annotators:
                scored = [mod.score_detect(t, ann) for t in pdf["text"]]
                pdf[f"{ann}_has_relation"] = [s[0] for s in scored]
                pdf[f"{ann}_output"] = [s[1] for s in scored]
            yield pdf

    return docs.mapInPandas(run, schema=out_schema)
