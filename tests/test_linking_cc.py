"""Entity-linking internals: blocking, similarity edges, connected components."""

from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.linking import (
    connected_components,
    fuzzy_mention_edges,
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


_FUZZY_MENTIONS = [
    # (mention, norm, n_docs) — norms precomputed as mention_table would
    ("林志玲", "林志玲", 5),
    ("志玲", "志玲", 2),        # nickname: given name without surname
    ("林志玲老師", "林志玲", 1),  # title variant (already normalized equal)
    ("林大同", "林大同", 3),     # same hot surname, different person
    ("陳大明", "陳大明", 4),     # distinct persons sharing a surname …
    ("陳小華", "陳小華", 2),     # … must NOT merge
    ("王建國", "王建國", 1),
]


def test_fuzzy_edges_nickname_merges_surname_sharers_do_not(spark):
    """Round-3 verdict item 3: 志玲 links to 林志玲 (bigram Jaccard 0.5 +
    suffix containment, found via the given-name block), while 陳大明/陳小華
    (same surname, bigram Jaccard 0) and 林大同 (same hot surname) stay
    separate."""
    mentions = spark.createDataFrame(
        _FUZZY_MENTIONS, "mention string, norm string, n_docs long"
    )
    edges = {
        tuple(sorted((r["src"], r["dst"])))
        for r in fuzzy_mention_edges(mentions, theta=0.5).collect()
    }
    assert ("志玲", "林志玲") in edges
    assert ("志玲", "林志玲老師") in edges  # via equal-norm transitivity too
    assert not any("陳大明" in e and "陳小華" in e for e in edges)
    assert not any("林大同" in e and "林志玲" in e for e in edges)
    assert not any("王建國" in e for e in edges)


def test_fuzzy_edges_salted_path_matches_unsalted(spark):
    """The salted off-diagonal self-join (hot-surname skew path) must produce
    the IDENTICAL edge set as the plain block self-join."""
    mentions = spark.createDataFrame(
        _FUZZY_MENTIONS, "mention string, norm string, n_docs long"
    )

    def canon(df):
        return {tuple(sorted((r["src"], r["dst"]))) for r in df.collect()}

    plain = canon(fuzzy_mention_edges(mentions, theta=0.5, n_salt=1))
    salted = canon(fuzzy_mention_edges(mentions, theta=0.5, n_salt=4))
    assert plain == salted and plain  # identical and non-empty


def test_fuzzy_edges_context_guard(spark):
    """With a context frame, a containment pair is kept only when the two
    mentions co-occur in at least one document — the precision guard against
    a bare given name bridging unrelated full names."""
    mentions = spark.createDataFrame(
        [("林志玲", "林志玲", 2), ("志玲", "志玲", 1), ("王志玲", "王志玲", 2)],
        "mention string, norm string, n_docs long",
    )
    context = spark.createDataFrame(
        [("u1", "林志玲"), ("u1", "志玲"), ("u2", "王志玲")],
        "url string, mention string",
    )
    edges = {
        tuple(sorted((r["src"], r["dst"])))
        for r in fuzzy_mention_edges(mentions, theta=0.5, context=context).collect()
    }
    assert ("志玲", "林志玲") in edges       # co-occur in u1
    assert ("志玲", "王志玲") not in edges   # never share a doc


def test_link_entities_fuzzy_end_to_end(spark):
    """link_entities(fuzzy=True): nickname + title variants land in ONE
    component; the default (fuzzy=False) run on the same input keeps them
    apart — parity pipeline unaffected by the opt-in."""
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.linking import (
        link_entities,
    )

    expanded = spark.createDataFrame(
        [
            ("u1", ["林志玲", "志玲", "陳大明"]),
            ("u2", ["林志玲老師", "陳大明"]),
            ("u3", ["陳小華", "志玲"]),
        ],
        "url string, ckip_entity array<string>",
    )
    fz = {r["mention"]: r["component"] for r in link_entities(expanded, fuzzy=True, n_salt=3).collect()}
    assert fz["林志玲"] == fz["志玲"] == fz["林志玲老師"]
    assert fz["陳大明"] != fz["陳小華"]
    assert fz["陳大明"] != fz["林志玲"]
    plain = {r["mention"]: r["component"] for r in link_entities(expanded).collect()}
    assert plain["林志玲"] == plain["林志玲老師"]  # exact-norm rule still merges
    assert plain["志玲"] != plain["林志玲"]        # nickname NOT merged by default


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
