"""Behavioral tests for the curation operators (operators/curation.py +
pack_sequences): CCNet bucketing exact/threshold-mode agreement,
decontamination on planted overlaps, PII redaction, concat-and-chunk
packing conservation, and the plan shapes each docstring claims."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.curation import (
    ccnet_buckets,
    ccnet_thresholds,
    decontaminate,
    pii_redact,
    word_ngrams,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.textstats import (
    quality_features,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.training import (
    pack_sequences,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark, n=120):
    rows = [
        (
            i,
            "en" if i % 3 else "zh",
            " ".join(f"w{(i * 7 + j) % 23}" for j in range(8 + i % 9)),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id int, lang string, text string")


# ---------------------------------------------------------------- ccnet


def test_ccnet_exact_terciles(spark):
    b = ccnet_buckets(quality_features(_docs(spark)))
    per = {
        (r["lang"], r["bucket"]): r["n"]
        for r in b.groupBy("lang", "bucket").agg(F.count("*").alias("n")).collect()
    }
    for lang in ("en", "zh"):
        sizes = [per.get((lang, name), 0) for name in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, sizes  # equal-mass terciles
    # head holds the best scores: min(head) >= max(tail) per language
    agg = (
        b.groupBy("lang")
        .agg(
            F.min(F.when(F.col("bucket") == "head", F.col("q_score"))).alias("h"),
            F.max(F.when(F.col("bucket") == "tail", F.col("q_score"))).alias("t"),
        )
        .collect()
    )
    for r in agg:
        assert r["h"] >= r["t"]


def test_ccnet_threshold_mode_matches_exact_off_boundary(spark):
    """The scale path (sample thresholds → map-only compare) agrees with
    exact ntile for every doc whose score is not exactly a cut point
    (ties AT a cut straddle the ntile boundary by doc_id — documented)."""
    q = quality_features(_docs(spark))
    exact = ccnet_buckets(q)
    cuts = ccnet_thresholds(exact)
    mapped = ccnet_buckets(q, thresholds=cuts)
    boundary = {c for v in cuts.values() for c in v}
    j = (
        exact.select("doc_id", "q_score", F.col("bucket_idx").alias("be"))
        .join(mapped.select("doc_id", F.col("bucket_idx").alias("bm")), "doc_id")
        .where(~F.col("q_score").isin(*boundary))
    )
    assert j.where(F.col("be") != F.col("bm")).count() == 0
    # threshold mode is map-only: no Exchange anywhere in the plan
    assert "Exchange" not in _plan(mapped)


def test_ccnet_unknown_lang_goes_to_tail(spark):
    q = quality_features(_docs(spark))
    cuts = ccnet_thresholds(ccnet_buckets(q))
    other = q.withColumn("lang", F.lit("xx"))
    got = ccnet_buckets(other, thresholds=cuts).select("bucket").distinct().collect()
    assert [r["bucket"] for r in got] == ["tail"]


# ------------------------------------------------------------ decontam


def test_decontaminate_planted_overlap(spark):
    ev = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")], "doc_id int, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "x alpha beta gamma y"),          # shares 1 trigram
            (2, "beta gamma delta epsilon tail"), # shares 2 trigrams
            (3, "completely different words here"),
            (4, "so br"),                         # < n words: no grams
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in decontaminate(train, ev, n=3, min_hits=2).collect()
    }
    assert got == {1: (1, 0), 2: (2, 1), 3: (0, 0), 4: (0, 0)}


def test_decontaminate_counts_distinct_grams_once(spark):
    ev = spark.createDataFrame([(0, "a b c")], "doc_id int, text string")
    train = spark.createDataFrame(
        [(1, "a b c and a b c again a b c")], "doc_id int, text string"
    )
    row = decontaminate(train, ev, n=3).collect()[0]
    assert row["n_overlap"] == 1  # distinct per doc, not per occurrence


def test_decontaminate_broadcasts_eval_side(spark):
    d = _docs(spark)
    df = decontaminate(
        d.where("doc_id % 10 != 0"), d.where("doc_id % 10 = 0")
    )
    assert "BroadcastHashJoin" in _plan(df)


def test_word_ngrams_short_doc_empty(spark):
    got = spark.range(1).select(
        word_ngrams(F.lit("one two"), 3).alias("g")
    ).collect()[0]["g"]
    assert got == []


# ----------------------------------------------------------------- pii


def test_pii_redact_values(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.ann+x@sub.example.org or 02-1234-5678 now"),
            (2, "server 192.168.0.1 and 10.0.0.255 reached"),
            (3, "nothing secret here"),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in pii_redact(df).collect()}
    assert got[1]["text"] == "mail me at <EMAIL> or <PHONE> now"
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ip"]) == (1, 1, 0)
    assert got[2]["text"] == "server <IP> and <IP> reached"
    assert got[2]["n_ip"] == 2
    assert got[3]["text"] == "nothing secret here"
    assert (got[3]["n_email"], got[3]["n_phone"], got[3]["n_ip"]) == (0, 0, 0)


def test_pii_redact_is_map_only(spark):
    assert "Exchange" not in _plan(pii_redact(_docs(spark)))


# ------------------------------------------------------------- packing


def test_pack_sequences_prefix_sum_and_chunking(spark):
    d = _docs(spark, n=90)
    got = sorted(
        pack_sequences(d, budget=50, shard_size=16).collect(),
        key=lambda r: r["doc_id"],
    )
    run = 0
    for r in got:
        assert r["start_offset"] == run  # exact exclusive prefix sum
        assert r["seq_id"] == run // 50
        assert r["pos_in_seq"] == run % 50
        run += r["n_tokens"]
    # every budget-sized window is fully covered: consecutive sequences
    seqs = sorted({r["seq_id"] for r in got})
    assert seqs == list(range(seqs[-1] + 1))


def test_pack_sequences_matches_single_window(spark):
    """Two-phase shard scheme == one global window (the scale-hostile
    formulation), on an id space with gaps so shards are uneven."""
    d = _docs(spark, n=80).where("doc_id % 7 != 3")
    from pyspark.sql.window import Window

    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.textstats import (
        bpe_token_count,
    )

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    ref = d.select(
        "doc_id",
        F.coalesce(
            F.sum(bpe_token_count(F.col("text")).cast("long")).over(w), F.lit(0)
        ).alias("ref_start"),
    )
    j = pack_sequences(d, budget=64, shard_size=8).join(ref, "doc_id")
    assert j.where(F.col("start_offset") != F.col("ref_start")).count() == 0


# ------------------------------------------------------- language mixing


def test_language_mix_upsamples_low_resource(spark):
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.curation import (
        language_mix_sample,
    )

    rows = [(i, "en" if i < 160 else "sw", "t") for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    got = language_mix_sample(d, target_total=100, alpha=0.5)
    kept = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # raw shares 80/20; sqrt-temperature shares ~ 2:1 -> minority overshare
    assert kept["sw"] / (kept["en"] + kept["sw"]) > 0.25
    # quota formula: ceil(100 * sqrt(n_l) / (sqrt(160)+sqrt(40)))
    import math

    sw = math.sqrt(160) + math.sqrt(40)
    assert kept["en"] == math.ceil(100 * math.sqrt(160) / sw)
    assert kept["sw"] == math.ceil(100 * math.sqrt(40) / sw)
    # ranks are a contiguous prefix per language
    for lang, n in kept.items():
        ranks = sorted(
            r["mix_rank"] for r in got.where(F.col("lang") == lang).collect()
        )
        assert ranks == list(range(1, n + 1))


def test_language_mix_quota_capped_by_population(spark):
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.curation import (
        language_mix_sample,
    )

    rows = [(i, "en" if i < 95 else "sw", "t") for i in range(100)]
    d = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    kept = {
        r["lang"]: r["n"]
        for r in language_mix_sample(d, target_total=1000, alpha=0.5)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert kept == {"en": 95, "sw": 5}  # least(n_l, quota) caps at population


def test_per_key_cap_dataframe_caps_match_scalar(spark):
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.training import (
        per_key_cap,
    )

    d = _docs(spark)
    caps = d.select("lang").distinct().select(
        F.col("lang"), F.lit(9).alias("cap")
    )
    a = sorted(
        (r["doc_id"], r["cap_rank"])
        for r in per_key_cap(d, key="lang", cap=9).collect()
    )
    b = sorted(
        (r["doc_id"], r["cap_rank"])
        for r in per_key_cap(d, key="lang", cap=caps).collect()
    )
    assert a == b and len(a) == 18
