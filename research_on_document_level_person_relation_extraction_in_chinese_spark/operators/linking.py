"""Entity linking & canonicalization (SURVEY §7.1 T5 — our addition per the
north rule: blocking + pairwise similarity + connected components).

Person mentions (NER surface forms: canonical names, simplified-script
spellings, title-suffixed aliases) are normalized (title strip + s2t),
blocked, pairwise-matched within blocks via a self-join, and merged with an
iterative DataFrame connected-components loop (alternating large-star /
small-star with per-iteration localCheckpoint — GraphFrames-like, no
external dependency, O(log n) rounds on any graph shape).

Scale notes: blocks are keyed on (surname, name length, 2nd char) — the extra
character *refines* hot-surname blocks (陳/林/王 skew) without losing recall
because our similarity requires equal normalized names, which share every
refined key. For fuzzier similarity, drop the refinement and rely on
``spark.sql.adaptive.skewJoin`` + key salting (union of salted off-diagonal
blocks); the block self-join below is written so the block key is pluggable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..scorers.rules import TITLES

_TITLE_PATTERN = "(" + "|".join(TITLES) + ")$"


def normalize_mention(col):
    """Strip trailing title suffixes (博士/教授/先生/老師); input is already
    Traditional (expansion stage runs NER over trad text)."""
    return F.regexp_replace(col, _TITLE_PATTERN, "")


def mention_table(expanded: DataFrame) -> DataFrame:
    """(mention, norm, n_docs) from the NER entity arrays."""
    return (
        expanded.select("url", F.explode("ckip_entity").alias("mention"))
        .groupBy("mention")
        .agg(F.countDistinct("url").alias("n_docs"))
        .withColumn("norm", normalize_mention(F.col("mention")))
    )


def mention_edges(mentions: DataFrame, refine_blocks: bool = True) -> DataFrame:
    """Blocked self-join producing similarity edges (src, dst) between
    distinct surface mentions that normalize to the same person."""
    block = F.concat_ws(
        "|",
        F.substring("norm", 1, 1),
        F.length("norm").cast("string"),
        *([F.substring("norm", 2, 1)] if refine_blocks else []),
    )
    m = mentions.select("mention", "norm").withColumn("block", block)
    a = m.alias("a")
    b = m.alias("b")
    return (
        a.join(b, on="block")
        .where(F.col("a.mention") < F.col("b.mention"))
        .where(F.col("a.norm") == F.col("b.norm"))  # pairwise similarity rule
        .select(F.col("a.mention").alias("src"), F.col("b.mention").alias("dst"))
    )


def _char_bigrams(col):
    """Distinct character bigrams of a name (JVM HOF, no UDF); single-char
    names shingle to themselves (sequence(1,0) would run DESCENDING)."""
    return F.array_distinct(
        F.when(F.length(col) < 2, F.array(col)).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.length(col) - F.lit(1)),
                lambda i: F.substring(col, i, F.lit(2)),
            )
        )
    )


def _salted_block_pairs(m: DataFrame, n_salt: int) -> DataFrame:
    """Self-join on ``block`` → candidate pairs (a.* , b.*), a.mention <
    b.mention, each unordered pair exactly once per block.

    ``n_salt > 1`` splits every block into salt sub-keys (left side keeps
    its own hash-salt, right side replicates across all salts) so a hot
    block — the 陳/林/王 surname skew, where one surname covers several
    percent of all Chinese names — shuffles as ``n_salt`` balanced
    sub-blocks instead of one straggler partition. Replication factor is
    ``n_salt`` on the right side only; results are identical to the
    unsalted join (asserted in tests/test_linking_cc.py)."""
    if n_salt <= 1:
        a, b = m.alias("a"), m.alias("b")
        return a.join(b, on="block").where(F.col("a.mention") < F.col("b.mention"))
    left = m.withColumn(
        "_salt", F.pmod(F.xxhash64("mention"), F.lit(n_salt)).cast("int")
    )
    right = m.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return (
        left.alias("a")
        .join(right.alias("b"), on=["block", "_salt"])
        .where(F.col("a.mention") < F.col("b.mention"))
    )


def fuzzy_mention_edges(
    mentions: DataFrame,
    theta: float = 0.5,
    n_salt: int = 1,
    context: DataFrame | None = None,
) -> DataFrame:
    """Fuzzy similarity edges (north rule: blocking + PAIRWISE name/context
    similarity) — catches variant spellings the exact-norm rule never merges
    (nicknames 志玲↔林志玲, partial given names), opt-in so the default
    pipeline keeps reference parity.

    Blocking (union of two keys, so recall survives both variant families):
    - surname block (first char of norm): same-surname spelling variants;
    - given-name block (last two chars): nickname = given name without the
      surname shares this key with the full name.
    Candidates then pass a pairwise predicate: char-bigram Jaccard(norm_a,
    norm_b) ≥ ``theta`` OR strict-suffix containment (the shorter norm, ≥2
    chars, is the longer's suffix — the nickname shape; reference cost
    context: aliases multiply pair-scoring in sota_ner/ckip_expansion.py:22-23).

    ``context`` (optional, (url, mention) doc co-occurrence) keeps only
    pairs that co-occur in ≥1 document — the precision guard against a bare
    given name bridging two different full names (志玲 ↔ 林志玲/王志玲 in
    unrelated corpora). At 100 TB you'd bound docs-per-mention first; the
    semi-join shape itself is shuffle-on-mention, no collect.

    ``n_salt`` routes the block self-join through the salted off-diagonal
    path for hot-surname skew (see ``_salted_block_pairs``)."""
    m = mentions.select("mention", "norm").where(F.length("norm") >= 2)
    sur_block = F.concat(F.lit("s|"), F.substring("norm", 1, 1))
    given_block = F.concat(
        F.lit("g|"), F.substring(F.col("norm"), F.length("norm") - F.lit(1), F.lit(2))
    )
    blocked = m.withColumn("block", F.explode(F.array(sur_block, given_block)))
    cand = (
        _salted_block_pairs(blocked, n_salt)
        .select(
            F.col("a.mention").alias("src"),
            F.col("a.norm").alias("na"),
            F.col("b.mention").alias("dst"),
            F.col("b.norm").alias("nb"),
        )
        .distinct()  # a pair sharing both blocks appears twice
    )
    bga, bgb = _char_bigrams(F.col("na")), _char_bigrams(F.col("nb"))
    jaccard = F.size(F.array_intersect(bga, bgb)) / F.size(F.array_union(bga, bgb))
    containment = (
        F.when(
            F.length("na") > F.length("nb"), F.col("na").endswith(F.col("nb"))
        )
        .when(F.length("nb") > F.length("na"), F.col("nb").endswith(F.col("na")))
        .otherwise(F.lit(False))
    )
    edges = cand.where((jaccard >= F.lit(theta)) | containment).select("src", "dst")
    if context is not None:
        ca = context.select(F.col("mention").alias("src"), "url")
        cb = context.select(F.col("mention").alias("dst"), "url")
        edges = (
            edges.join(ca, on="src")
            .join(cb, on=["dst", "url"])
            .select("src", "dst")
            .distinct()
        )
    return edges


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """(src > dst) direction, self-loops dropped, deduped."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: every node connects its strictly-larger neighbors to its
    minimum neighborhood label (Kiveris et al., "Connected Components in
    MapReduce and Beyond", op. large-star). Keeps the (src > dst) canon."""
    bidir = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = bidir.groupBy("src").agg(F.min("dst").alias("_mn"))
    m = F.least(F.col("_mn"), F.col("src"))
    return (
        bidir.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), m.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: every node links all its smaller neighbors (and itself)
    to the minimum of them. Input/output in (src > dst) canon."""
    mins = edges.groupBy("src").agg(F.min("dst").alias("_mn"))
    relink = (
        edges.join(mins, "src")
        .where(F.col("dst") != F.col("_mn"))
        .select(F.col("dst").alias("src"), F.col("_mn").alias("dst"))
    )
    self_link = mins.select("src", F.col("_mn").alias("dst"))
    return relink.union(self_link).where(F.col("src") != F.col("dst")).distinct()


def _edges_equal(a: DataFrame, b: DataFrame) -> bool:
    """Exact set equality of two (already deduped, localCheckpointed) edge
    frames — a probabilistic checksum could collide and declare convergence
    one round early, silently splitting an entity."""
    if a.count() != b.count():
        return False
    return a.exceptAll(b).limit(1).count() == 0


def connected_components(vertices: DataFrame, edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """Alternating large-star/small-star connected components over string
    vertex ids → (id, component) where component = the component's minimum
    id (Kiveris et al. — O(log n) rounds even on long chains, vs the
    O(diameter) of plain min-label propagation).

    Iterative DataFrame joins with ``localCheckpoint`` per round to cut the
    growing lineage (SURVEY §4 custom item 2). Raises if the edge set has
    not reached a fixpoint within ``max_iter`` rounds — unconverged labels
    would silently split entities."""
    e = _canonical_edges(edges).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        prev_e = e
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        if _edges_equal(e, prev_e):
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "large-star/small-star rounds"
        )
    # fixpoint edges form stars: src (child) → dst (component root)
    roots = e.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    return (
        vertices.select("id")
        .join(roots, "id", "left")
        .select("id", F.coalesce("component", "id").alias("component"))
    )


def link_entities(
    expanded: DataFrame,
    fuzzy: bool = False,
    theta: float = 0.5,
    n_salt: int = 1,
    use_context: bool = False,
) -> DataFrame:
    """→ (mention, norm, n_docs, component) — the alias-resolution table.

    ``fuzzy=True`` unions the pairwise-similarity edges (nickname/variant
    merging, ``fuzzy_mention_edges``) into the exact-norm edge set before
    connected components; OFF by default so the parity pipeline keeps
    reference behavior (same opt-in discipline as ``coref_stage``).
    ``use_context=True`` additionally requires fuzzy pairs to co-occur in
    at least one document."""
    mentions = mention_table(expanded)
    edges = mention_edges(mentions)
    if fuzzy:
        context = (
            expanded.select("url", F.explode("ckip_entity").alias("mention")).distinct()
            if use_context
            else None
        )
        edges = edges.union(
            fuzzy_mention_edges(mentions, theta=theta, n_salt=n_salt, context=context)
        ).distinct()
    comps = connected_components(
        mentions.select(F.col("mention").alias("id")), edges
    )
    return mentions.join(
        comps.withColumnRenamed("id", "mention"), on="mention", how="left"
    ).withColumn("component", F.coalesce("component", "mention"))
