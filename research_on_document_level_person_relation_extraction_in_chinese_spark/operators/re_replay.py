"""Entry point C — the fine-tuned-model replay pipelines (SURVEY §3.3).

Reference flow (``README.md:17-19``):
- NER→RE decomposed path: per-pair 5-way inference over all NER-entity pairs
  surviving in ``trad_raw_content[:1024]`` (``re_inference.py:27-66``), then
  per-doc reassembly into detection-schema answer text
  ``有 ('p1', 'p2', 'rel'), ...`` (``re_inference.py:67-79``), then re-parse
  through the SAME tolerant F1 kernel (``postprecess.py:338-339`` runs
  ``extractor(path, 'mt5')``), then triple P/R/F1 vs ``merge_label_1024``.
- Generation path: one doc-level generation per document
  (``inference.py:11-65``) emitting the triples text directly; identical
  post-processing.

Spark shape: pair generation + per-pair scoring + reassembly are ONE
struct-returning pandas UDF (one Arrow crossing; per-doc fan-out is bounded
by the same C(n,2) combinatorics the reference has — NER entity lists are
small by the F10 density guard upstream). The re-parse stays in the shared
kernel (``functions/parse.py``) so predictions round-trip through exactly
the textual schema the annotators used. Inference granularity is per-pair
like the reference, but batched per Arrow batch instead of one model/HTTP
call per pair.

The deterministic scorer stand-ins score the Traditional-converted head
(the reference prompts the raw head but checks containment on the trad head,
``re_inference.py:33-41``; using the trad head on both the Spark and the
parity-port side keeps the replay deterministic and script-consistent).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from ..functions.analysis import generate_pairs
from ..functions.parse import (
    HAS_RELATION,
    assemble_relation_answer,
    parse_single_class,
)
from ..scorers import get_scorer
from ..scorers.rules import strip_title
from .parse import PARSED_DT, _parse_cell

_REPLAY_DT = StructType(
    [
        StructField("has_relation", StringType()),
        StructField("output", StringType()),
        StructField("n_pairs_scored", IntegerType()),
        StructField("n_pairs_skipped", IntegerType()),
    ]
)

RETRY_BUDGET = 2  # reference re_inference.py:50 retry_count


def replay_one_doc(mod, trad_text: str, entities: list[str], max_length: int) -> dict:
    """Plain-Python replay of one document — shared verbatim by the Spark UDF
    below and the parity oracle (plans/reference_port.py).

    Mentions are normalized (title-suffix strip, the entity-linking rule)
    before pair generation: the reference replays raw NER surface forms
    (``re_inference.py:36-41``), which systematically mismatches the golden
    labels whenever NER caught a title-suffixed alias — exactly the alias
    problem the north rule's canonicalization stage exists to fix, so the
    rebuild applies it here too. The textual answer schema is unchanged."""
    head = (trad_text or "")[:max_length]
    names: list[str] = []
    for e in list(entities) if entities is not None else []:
        c = strip_title(e)
        if c not in names:
            names.append(c)
    answers: list[tuple[str, str, str]] = []
    scored = skipped = 0
    for pair in generate_pairs(names):
        if pair[0] not in head or pair[1] not in head:
            continue  # truncation-survival gate (re_inference.py:41)
        scored += 1
        cls = None
        for _ in range(RETRY_BUDGET):
            cls = parse_single_class(mod.score_re_pair(head, pair[0], pair[1]))
            if cls is not None:
                break
        if cls is None:
            skipped += 1  # unparseable after retries → pair silently dropped
        elif cls != "沒有":
            answers.append((pair[0], pair[1], cls))
    status, output = assemble_relation_answer(answers)
    return {
        "has_relation": status,
        "output": output,
        "n_pairs_scored": scored,
        "n_pairs_skipped": skipped,
    }


def make_re_replay_udf(scorer: str = "deterministic", max_length: int = 1024):
    mod = get_scorer(scorer)

    @pandas_udf(_REPLAY_DT)
    def replay_udf(trad_text: pd.Series, entities: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [replay_one_doc(mod, t, e, max_length) for t, e in zip(trad_text, entities)]
        )

    return replay_udf


def re_replay_stage(
    expanded: DataFrame,
    scorer: str = "deterministic",
    max_length: int = 1024,
    model_name: str = "mt5",
) -> DataFrame:
    """Docs with non-empty ``merge_label_1024`` (the reference's inference
    gate, ``re_inference.py:117``) → + ``{model}_has_relation``,
    ``{model}_output``, ``{model}_pairs_scored``, ``{model}_pairs_skipped``.
    """
    udf = make_re_replay_udf(scorer, max_length)
    df = expanded.filter(F.size("merge_label_1024") > 0).withColumn(
        "_rp", udf(F.col("trad_text"), F.col("ckip_entity"))
    )
    return (
        df.withColumn(f"{model_name}_has_relation", F.col("_rp.has_relation"))
        .withColumn(f"{model_name}_output", F.col("_rp.output"))
        .withColumn(f"{model_name}_pairs_scored", F.col("_rp.n_pairs_scored"))
        .withColumn(f"{model_name}_pairs_skipped", F.col("_rp.n_pairs_skipped"))
        .drop("_rp")
    )


def re_pair_predictions(
    pairs: DataFrame,
    scorer: str = "deterministic",
    max_length: int = 1024,
) -> DataFrame:
    """Per-pair predictions over the exploded RE table
    (``operators.training.re_training_pairs`` output): + ``pred_label``
    (沒有 when the answer stays unparseable after retries). Feeds
    ``evaluate_re_micro`` — the reference's ``evalute_re`` consumer
    (``evalute.py:200-218`` scores exactly this pred-vs-golden column pair).
    """
    mod = get_scorer(scorer)

    @pandas_udf(StringType())
    def pred_udf(text: pd.Series, subj: pd.Series, obj: pd.Series) -> pd.Series:
        out = []
        for t, s, o in zip(text, subj, obj):
            head = (t or "")[:max_length]
            cls = None
            for _ in range(RETRY_BUDGET):
                cls = parse_single_class(mod.score_re_pair(head, s, o))
                if cls is not None:
                    break
            out.append(cls if cls is not None else "沒有")
        return pd.Series(out)

    return pairs.withColumn("pred_label", pred_udf(F.col("text"), F.col("subj"), F.col("obj")))


def make_generation_udf(scorer: str = "deterministic", max_length: int = 1024):
    mod = get_scorer(scorer)

    @pandas_udf(StringType())
    def generate_udf(text: pd.Series) -> pd.Series:
        return pd.Series([mod.score_generate((t or "")[:max_length]) for t in text])

    return generate_udf


def generation_replay_stage(
    expanded: DataFrame,
    scorer: str = "deterministic",
    max_length: int = 1024,
    model_name: str = "gen",
) -> DataFrame:
    """Doc-level generation replay (M11): one answer text per document over
    the raw text head (reference ``inference.py:90-109`` scores
    ``raw_content[:1024]``; the model emits Traditional triples)."""
    udf = make_generation_udf(scorer, max_length)
    df = expanded.filter(F.size("merge_label_1024") > 0).withColumn(
        f"{model_name}_output", udf(F.col("text"))
    )
    return df.withColumn(
        f"{model_name}_has_relation",
        F.when(F.col(f"{model_name}_output").startswith(HAS_RELATION), HAS_RELATION)
        .otherwise(F.substring(F.col(f"{model_name}_output"), 1, 1)),
    )


def replay_triples(replayed: DataFrame, model_name: str = "mt5") -> DataFrame:
    """Re-parse the reassembled answers through the tolerant F1 kernel
    (reference ``postprecess.py:338-339``) → (url, subj, obj, rel)."""

    @pandas_udf(PARSED_DT)
    def parse_udf(output: pd.Series, has: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([_parse_cell(o, h, True) for o, h in zip(output, has)])

    parsed = replayed.withColumn(
        "_parsed",
        parse_udf(F.col(f"{model_name}_output"), F.col(f"{model_name}_has_relation")),
    )
    return (
        parsed.select("url", F.explode("_parsed.ternary").alias("t"))
        .select("url", "t.subj", "t.obj", "t.rel")
        .distinct()
    )
