"""ngram_jaccard_pairs strategies: dense bitmask / prefix-filtered inverted
index / unfiltered baseline produce IDENTICAL output; prefix filtering
actually prunes on Zipfian (hot-shingle) data; dense is chosen automatically
on tiny vocabularies."""

import pytest
from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup import (
    _inverted_index_counts,
    _prefix_filtered_counts,
    char_shingles,
    ngram_jaccard_pairs,
)

HOT = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"  # boilerplate every doc shares


def _unique_tail(i: int, length: int = 30) -> str:
    return "".join(chr(0x4E00 + i * 64 + j) for j in range(length))


@pytest.fixture(scope="module")
def zipf_docs(spark):
    """40 docs sharing a hot boilerplate prefix + unique tails, plus 3 exact
    near-dup pairs. Hot shingles co-occur everywhere (quadratic fan-out for
    the naive inverted index); true near-dups share rare shingles."""
    rows = []
    for i in range(40):
        rows.append((i, "b0", HOT + _unique_tail(i)))
    for j, i in enumerate((50, 51, 52)):
        rows.append((i, "b0", HOT + _unique_tail(100 + j)))
        rows.append((i + 10, "b0", HOT + _unique_tail(100 + j)))  # exact dup
    return spark.createDataFrame(rows, "doc_id int, source string, text string").cache()


def _pairs(docs, strategy):
    return sorted(
        map(
            tuple,
            ngram_jaccard_pairs(
                docs, block_col="source", n=3, threshold=0.5, strategy=strategy
            ).collect(),
        )
    )


def test_strategies_identical_output(spark, zipf_docs):
    dense = _pairs(zipf_docs, "dense")
    prefix = _pairs(zipf_docs, "prefix")
    inverted = _pairs(zipf_docs, "inverted")
    assert dense == prefix == inverted
    # the three constructed dup pairs (and only they) survive θ=0.5
    assert [(a, b) for a, b, _ in dense] == [(50, 60), (51, 61), (52, 62)]
    assert all(j == 1.0 for _, _, j in dense)


def test_prefix_filter_prunes_hot_shingles(spark, zipf_docs):
    sh = zipf_docs.select(
        F.col("source").alias("blk"),
        F.col("doc_id").alias("id"),
        F.explode(char_shingles(F.col("text"), 3)).alias("sh"),
    )
    co_occurring = _inverted_index_counts(sh).count()
    candidates = _prefix_filtered_counts(sh, 0.5).count()
    # every pair co-occurs via the hot boilerplate (C(46,2)=1035); the prefix
    # filter joins only on rare shingles so candidates collapse to the dups
    assert co_occurring == 46 * 45 // 2
    assert candidates <= 10, candidates


def test_auto_picks_dense_on_tiny_vocab(spark):
    rows = [(i, "b", "xyxyxyxyzz") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id int, source string, text string")
    out = ngram_jaccard_pairs(docs, block_col="source", n=3, threshold=0.5)
    # all identical docs → all C(6,2) pairs at jaccard 1.0
    assert out.count() == 15
    assert out.agg(F.min("jaccard")).collect()[0][0] == 1.0


def test_simhash_banded_lossless(spark, zipf_docs):
    """Pigeonhole guarantee: banded candidate generation finds EVERY pair
    within hamming distance < bands — equal to the brute-force all-pairs."""
    from pyspark.sql import functions as F2

    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup import (
        simhash,
        simhash_near_dup_pairs,
    )

    got = sorted(
        map(
            tuple,
            simhash_near_dup_pairs(
                zipf_docs, n=2, bits=16, bands=4, max_distance=3
            ).collect(),
        )
    )
    sims = zipf_docs.select(
        F2.col("doc_id").alias("id"), simhash(F2.col("text"), n=2, bits=16).alias("h")
    )
    a, b = sims.alias("a"), sims.alias("b")
    brute = sorted(
        map(
            tuple,
            a.join(b, F2.col("a.id") < F2.col("b.id"))
            .select(
                F2.col("a.id").alias("a_id"),
                F2.col("b.id").alias("b_id"),
                F2.bit_count(F2.col("a.h").bitwiseXOR(F2.col("b.h"))).cast("int").alias("hamming"),
            )
            .where(F2.col("hamming") <= 3)
            .collect(),
        )
    )
    assert got == brute
    assert len(got) >= 3  # the planted exact dups are hamming 0


def test_simhash_banded_rejects_lossy_params(spark, zipf_docs):
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )

    with pytest.raises(ValueError):
        simhash_near_dup_pairs(zipf_docs, bands=4, max_distance=4)


def test_dense_rejects_large_vocab(spark, zipf_docs):
    with pytest.raises(ValueError):
        ngram_jaccard_pairs(
            zipf_docs, block_col="source", n=3, threshold=0.5,
            strategy="dense", dense_vocab_limit=10,
        )


def test_empty_and_short_inputs(spark):
    """Degenerate inputs (empty frame; every text shorter than n) must yield
    empty results, not crash — the auto paths fall back gracefully."""
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    short = spark.createDataFrame(
        [(1, "b", "ab"), (2, "b", "x")], "doc_id int, source string, text string"
    )
    assert ngram_jaccard_pairs(short, block_col="source", n=3).count() == 0
    assert minhash_lsh_pairs(short, n=3, k=8, bands=2, threshold=0.5).count() == 0
    empty = short.where("doc_id < 0")
    assert ngram_jaccard_pairs(empty, block_col="source", n=3).count() == 0


def test_minhash_verify_strategies_agree(spark, zipf_docs):
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    kw = dict(n=3, k=8, bands=4, threshold=0.5)
    dense = sorted(map(tuple, minhash_lsh_pairs(zipf_docs, verify="dense", **kw).collect()))
    inv = sorted(map(tuple, minhash_lsh_pairs(zipf_docs, verify="inverted", **kw).collect()))
    assert dense == inv and len(dense) >= 3


def test_minhash_hoisted_hashes_bit_identical(spark, zipf_docs):
    """The hot path hoists transform(sh, shingle_hash) to its own projection
    (md5 once, not once per permutation); signatures must be bit-identical
    to the embedded-form Column API."""
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup import (
        char_shingles,
        minhash_signature,
        minhash_signature_from_hashes,
        shingle_hash,
    )

    base = zipf_docs.select(
        "doc_id", char_shingles(F.col("text"), 3).alias("sh")
    )
    embedded = base.withColumn("sig", minhash_signature(F.col("sh"), 8))
    hoisted = (
        base.withColumn("_hv", F.transform(F.col("sh"), shingle_hash))
        .withColumn("sig", minhash_signature_from_hashes(F.col("_hv"), 8))
        .drop("_hv")
    )
    a = {r["doc_id"]: r["sig"] for r in embedded.select("doc_id", "sig").collect()}
    b = {r["doc_id"]: r["sig"] for r in hoisted.select("doc_id", "sig").collect()}
    assert a == b and len(a) > 0


def test_simhash_hoisted_hashes_bit_identical(spark, zipf_docs):
    """simhash_near_dup_pairs hoists the shingle-hash array (md5 once, not
    once per bit); fingerprints must match the embedded-form Column API."""
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup import (
        char_shingles,
        shingle_hash,
        simhash,
        simhash_from_hashes,
    )

    embedded = zipf_docs.select(
        "doc_id", simhash(F.col("text"), n=2, bits=16).alias("h")
    )
    hoisted = zipf_docs.select(
        "doc_id",
        F.transform(char_shingles(F.col("text"), 2), shingle_hash).alias("_hv"),
    ).select("doc_id", simhash_from_hashes(F.col("_hv"), 16).alias("h"))
    a = {r["doc_id"]: r["h"] for r in embedded.collect()}
    b = {r["doc_id"]: r["h"] for r in hoisted.collect()}
    assert a == b and len(a) > 0


def test_word_ngrams_hoisted_words_identical(spark, zipf_docs):
    """word_ngrams_from_words over a hoisted split column must equal the
    embedded word_ngrams (incl. short-doc empty arrays)."""
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.curation import (
        split_words,
        word_ngrams,
        word_ngrams_from_words,
    )

    docs = zipf_docs.unionByName(
        spark.createDataFrame(
            [(9001, "b", "one two"), (9002, "b", " x ")],
            "doc_id int, source string, text string",
        )
    )
    embedded = docs.select("doc_id", word_ngrams(F.col("text"), 3).alias("g"))
    hoisted = docs.select(
        "doc_id", split_words(F.col("text")).alias("_w")
    ).select("doc_id", word_ngrams_from_words(F.col("_w"), 3).alias("g"))
    a = {r["doc_id"]: r["g"] for r in embedded.collect()}
    b = {r["doc_id"]: r["g"] for r in hoisted.collect()}
    assert a == b and len(a) > 2


def test_prefix_positional_filter_keeps_boundary_pair(spark):
    """PPJoin positional-filter losslessness at the EXACT boundary: two
    9-shingle docs sharing 6 shingles (Jaccard = 6/12 = θ = 0.5) whose
    3 unique shingles are rarer (df=1) than the shared ones (df=2), so the
    first common shingle sits at rank 4 and the positional upper bound
    1+min(9−4, 9−4) = 6 EQUALS the required overlap θ/(1+θ)·18 = 6 — the
    pair must survive the filter and verify at jaccard 0.5."""
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup import (
        _jaccard_select,
        _prefix_filtered_counts,
    )

    common = [f"c{i}" for i in range(6)]
    rows = [("b", 1, s) for s in common + ["ua1", "ua2", "ua3"]] + [
        ("b", 2, s) for s in common + ["ub1", "ub2", "ub3"]
    ]
    sh = spark.createDataFrame(rows, "blk string, id int, sh string")
    out = _jaccard_select(_prefix_filtered_counts(sh, 0.5), 0.5).collect()
    assert [(r["a_id"], r["b_id"], r["jaccard"]) for r in out] == [(1, 2, 0.5)]
