"""Entity-linking internals: blocking, similarity edges, connected components."""

from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.linking import (
    connected_components,
    mention_edges,
    normalize_mention,
)


def test_normalize_strips_titles(spark):
    df = spark.createDataFrame(
        [("陳大文博士",), ("陳大文",), ("林美玲老師",), ("王建國",)], "mention string"
    )
    got = dict(
        df.select("mention", normalize_mention(F.col("mention")).alias("n")).collect()
    )
    assert got["陳大文博士"] == "陳大文"
    assert got["林美玲老師"] == "林美玲"
    assert got["王建國"] == "王建國"


def test_mention_edges_blocked(spark):
    mentions = spark.createDataFrame(
        [
            ("陳大文", "陳大文", 3),
            ("陳大文博士", "陳大文", 1),
            ("陳小明", "陳小明", 2),  # same surname+len block, different norm
            ("王建國", "王建國", 1),
        ],
        "mention string, norm string, n_docs long",
    )
    edges = {(r["src"], r["dst"]) for r in mention_edges(mentions).collect()}
    assert edges == {("陳大文", "陳大文博士")}


def test_connected_components_multihop(spark):
    """a-b, b-c, plus isolated d: one 3-node component + singleton."""
    vertices = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "id string")
    edges = spark.createDataFrame([("b", "a"), ("c", "b")], "src string, dst string")
    comp = {r["id"]: r["component"] for r in connected_components(vertices, edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["d"] == "d"


def test_connected_components_chain_converges(spark):
    """A 9-node path graph needs multiple propagation rounds."""
    ids = [f"n{i}" for i in range(9)]
    vertices = spark.createDataFrame([(i,) for i in ids], "id string")
    edges = spark.createDataFrame(
        [(ids[i + 1], ids[i]) for i in range(8)], "src string, dst string"
    )
    comp = connected_components(vertices, edges, max_iter=20)
    assert {r["component"] for r in comp.collect()} == {"n0"}


def test_connected_components_long_chain_olog_rounds(spark):
    """1000-node chain: min-label propagation would need ~1000 rounds;
    large-star/small-star converges within the O(log n) budget."""
    ids = [f"n{i:04d}" for i in range(1000)]
    vertices = spark.createDataFrame([(i,) for i in ids], "id string")
    edges = spark.createDataFrame(
        [(ids[i + 1], ids[i]) for i in range(999)], "src string, dst string"
    )
    comp = connected_components(vertices, edges, max_iter=15)
    rows = comp.collect()
    assert len(rows) == 1000
    assert {r["component"] for r in rows} == {"n0000"}


def test_connected_components_raises_when_budget_too_small(spark):
    import pytest

    ids = [f"n{i:03d}" for i in range(64)]
    vertices = spark.createDataFrame([(i,) for i in ids], "id string")
    edges = spark.createDataFrame(
        [(ids[i + 1], ids[i]) for i in range(63)], "src string, dst string"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(vertices, edges, max_iter=1)


def test_connected_components_two_components_and_dups(spark):
    vertices = spark.createDataFrame(
        [(x,) for x in ("a", "b", "c", "x", "y", "z")], "id string"
    )
    edges = spark.createDataFrame(
        # duplicate + reversed + self-loop edges must be tolerated
        [("b", "a"), ("a", "b"), ("c", "c"), ("c", "a"), ("y", "x"), ("z", "y")],
        "src string, dst string",
    )
    comp = {r["id"]: r["component"] for r in connected_components(vertices, edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == comp["z"] == "x"
