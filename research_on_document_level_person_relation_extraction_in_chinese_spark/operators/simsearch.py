"""Similarity search over embedding columns (driver mandate).

- ``cosine_topk``: brute-force cosine top-k — the correctness baseline.
  Dot/norm math uses ``zip_with`` + ``aggregate`` (JVM, ordered summation →
  bit-identical to the DuckDB oracle's ``list_dot_product``).
- ``bucketed_ann_topk``: sign-bucketed (random-hyperplane-style LSH on the
  first ``sign_dims`` coordinates) variant — the scale path: the query probes
  only its own bucket, cutting the scan by ~2^sign_dims; buckets are a plain
  column so the scan is partition-prunable when the table is written
  partitioned by bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def norm(a: Column) -> Column:
    """sqrt(dot(a, a)) — hoist this to a COLUMN on each side of a pairwise
    join and use :func:`cosine_with_norms`: per-pair work drops to one dot
    fold (the r5 shape re-folded both self-dots per candidate pair — 2/3 of
    the verify arithmetic). Bit-identical: sqrt(x)*sqrt(y) is unchanged,
    merely evaluated once per row instead of once per pair."""
    return F.sqrt(dot(a, a))


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    return dot(a, b) / (na * nb)


def _query_literal(query_vec: list[float]) -> Column:
    # one SQL-text literal (single py4j call, JVM parse) — building dim
    # individual F.lit Columns costs ~dim×2 py4j round-trips of pure driver
    # overhead per query construction; repr() round-trips doubles exactly
    return F.expr("array(" + ",".join(f"{float(v)!r}D" for v in query_vec) + ")")


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector. Ordering is by
    exact double cosine desc then id asc; output cosine rounded to 6 dp."""
    q = _query_literal(query_vec)
    e = _to_double(F.col(vec_col))
    return (
        emb.select(F.col(id_col), cosine(e, q).alias("_cos"))
        .orderBy(F.col("_cos").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round(F.col("_cos"), 6).alias("cosine"))
    )


def sign_bucket(vec: Column, sign_dims: int = 3) -> Column:
    """LSH bucket id from the sign bits of the first ``sign_dims`` coords."""
    out = F.lit(0)
    for d in range(sign_dims):
        out = out + F.when(F.element_at(vec, d + 1) >= 0, F.lit(1 << d)).otherwise(F.lit(0))
    return out


def bucketed_ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    sign_dims: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: scan only the query's sign bucket."""
    qbucket = 0
    for d in range(sign_dims):
        if float(query_vec[d]) >= 0:
            qbucket |= 1 << d
    q = _query_literal(query_vec)
    e = _to_double(F.col(vec_col))
    return (
        emb.where(sign_bucket(F.col(vec_col), sign_dims) == qbucket)
        .select(F.col(id_col), cosine(e, q).alias("_cos"))
        .orderBy(F.col("_cos").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round(F.col("_cos"), 6).alias("cosine"))
    )


def random_hyperplanes(n_planes: int, dim: int, seed: str = "ann") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes via md5 — reproducible as
    literal coefficient arrays in the SQL oracle (no RNG state)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def _plane_dot(vec: Column, plane: list[float]) -> Column:
    lits = _query_literal(plane)
    return F.aggregate(
        F.zip_with(vec, lits, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def band_bucket(vec: Column, planes: list[list[float]], band: int, rows_per_band: int) -> Column:
    """Sign bits of ``rows_per_band`` hyperplane dot products, packed into one
    int — the per-band LSH bucket id of the OR-amplified scheme."""
    out = F.lit(0)
    for j in range(rows_per_band):
        plane = planes[band * rows_per_band + j]
        out = out + F.when(_plane_dot(vec, plane) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


def banded_candidates(base: DataFrame, bands: int) -> DataFrame:
    """Distinct candidate pairs colliding in at least one band (the
    OR-amplification union); ``base`` carries id + bk0..bk{bands-1}."""
    cand = None
    for b in range(bands):
        a_side = base.select(F.col("id").alias("a_id"), F.col(f"bk{b}").alias("bk"))
        b_side = base.select(F.col("id").alias("b_id"), F.col(f"bk{b}").alias("bk"))
        pairs = (
            a_side.join(b_side, "bk")
            .where(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    return cand.distinct()


def vector_dim(emb: DataFrame, vec_col: str = "embedding", expected: int | None = None) -> int:
    """Uniform embedding dimensionality of ``vec_col`` (one tiny min/max-size
    aggregate). Raises on ragged lengths or an ``expected`` mismatch — without
    this guard ``zip_with`` pads mismatched lengths with NULLs, the plane dot
    product goes NULL, and ``F.when(NULL >= 0, ...)`` silently zeroes sign
    bits (degenerate buckets, silent recall loss)."""
    row = emb.select(
        F.min(F.size(F.col(vec_col))).alias("lo"), F.max(F.size(F.col(vec_col))).alias("hi")
    ).first()
    if row is None or row["lo"] is None:
        return expected if expected is not None else 0
    if row["lo"] != row["hi"]:
        raise ValueError(f"ragged {vec_col!r} lengths: {row['lo']}..{row['hi']}")
    if expected is not None and row["lo"] != expected:
        raise ValueError(f"{vec_col!r} has dim {row['lo']}, expected {expected}")
    return row["lo"]


def banded_base(
    emb: DataFrame,
    n_planes: int = 16,
    bands: int = 4,
    seed: str = "ann",
    max_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = 64,
) -> DataFrame:
    """(id, e, bk0..bk{bands-1}) — the bucketed projection of the banded
    scheme (shared by the near-dup join and the candidate-count tests).
    ``dim`` is validated against the data (``dim=None`` derives it)."""
    rows_per_band = n_planes // bands
    base = emb
    if max_id is not None:
        base = base.where(F.col(id_col) < max_id)
    dim = vector_dim(base, vec_col, expected=dim)
    planes = random_hyperplanes(n_planes, dim, seed)
    e = _to_double(F.col(vec_col))
    return base.select(
        F.col(id_col).alias("id"),
        e.alias("e"),
        *[
            band_bucket(e, planes, b, rows_per_band).alias(f"bk{b}")
            for b in range(bands)
        ],
    )


def banded_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 16,
    bands: int = 4,
    seed: str = "ann",
    max_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = 64,
) -> DataFrame:
    """Embedding near-duplicate pairs with banded random-hyperplane LSH +
    OR-amplification — the scale shape of the embedding-dedup family.

    ``n_planes`` sign bits split into ``bands`` bands of ``n_planes/bands``
    rows; a pair is a candidate iff ALL bits of SOME band agree (collision
    prob. for cosine angle θ: 1-(1-(1-θ/π)^r)^b — more planes ⇒ smaller
    buckets ⇒ sub-quadratic candidates; more bands ⇒ recall back up). Each
    band's bucket join is an equi-join on a uniform int key (AQE splits any
    residual skew); candidates are unioned, deduped, then verified with the
    exact cosine. Recall is the LSH guarantee, precision is exact.
    """
    if n_planes % bands:
        raise ValueError("bands must divide n_planes")
    # NOTE a managed persist of ``base`` was measured and rejected (r6 A/B:
    # 1.97 s → 1.99 s, within noise): the candidate-join sides are narrow
    # (id, bk_b) projections that prune the plane-dot work per band, and
    # caching the array<double> column costs nested-row decode per consumer
    # — the same finding as semdedup's rejected persist.
    base = banded_base(emb, n_planes, bands, seed, max_id, id_col, vec_col, dim)
    cand = banded_candidates(base, bands)

    # norms hoisted to per-row columns BEFORE the verify joins (r6): the
    # join boundary materializes them once per vector, so each candidate
    # pair folds one dot product instead of three — bit-identical cosines
    vecs = base.select("id", "e", norm(F.col("e")).alias("nv"))
    joined = (
        cand.join(
            vecs.select(
                F.col("id").alias("a_id"), F.col("e").alias("ea"), F.col("nv").alias("na")
            ),
            "a_id",
        )
        .join(
            vecs.select(
                F.col("id").alias("b_id"), F.col("e").alias("eb"), F.col("nv").alias("nb")
            ),
            "b_id",
        )
    )
    cos = cosine_with_norms(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"))
    return (
        joined.withColumn("_cos", F.round(cos, 6))
        .where(F.col("_cos") >= threshold)
        .select("a_id", "b_id", F.col("_cos").alias("cosine"))
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 16,
    bands: int = 4,
    seed: str = "emb",
    max_id: int | None = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup family, driver mandate).

    Delegates to the banded OR-amplified scheme (``banded_near_dup_pairs``)
    — round 2 shipped this as a fixed 8-bucket sign-prefix blocking whose
    per-bucket all-pairs join grows O(N²/8); at 100× the bucket population
    grows linearly and candidates quadratically, so the plan was a
    scale-killer (round-2 verdict). The banded scheme keeps candidate volume
    sub-quadratic (more planes ⇒ smaller buckets) while OR-amplification
    across bands preserves recall, and the verify step stays exact."""
    return banded_near_dup_pairs(
        emb,
        threshold=threshold,
        n_planes=n_planes,
        bands=bands,
        seed=seed,
        max_id=max_id,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-partitioned scale path
# --------------------------------------------------------------------------

def _cosine_py(a: list[float], b: list[float]) -> float:
    import math

    dp = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dp / (na * nb)


def ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic centroid table: the vectors with ``id < n_centroids``.

    A seed rule standing in for the k-means‖ fit a production build would run
    once offline — the *serving* plan below is identical either way: the
    centroid table is tiny (k ≪ N), lives on the driver, and is inlined as a
    literal array so assignment is a pure per-row map (no join, no shuffle).
    """
    rows = (
        emb.where(F.col(id_col) < n_centroids)
        .select(F.col(id_col).cast("int").alias("cid"), _to_double(F.col(vec_col)).alias("cv"))
        .collect()
    )
    return sorted((r["cid"], [float(x) for x in r["cv"]]) for r in rows)


def ivf_assign(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds a ``cluster`` column = argmax-cosine centroid id (first wins ties).

    The argmax runs as a JVM HOF over a single nested-array centroid literal
    (centroid ``cid`` ≡ array position − 1; dense 0..k−1 ids enforced) —
    per-row, partition-local, shuffle-free; at 100 TB the output is written
    partitioned/bucketed BY ``cluster`` so probes prune files (same contract
    as ``sign_bucket``). Evaluating positions in cid order keeps the lowest
    cid on exact ties, matching the SQL oracle's
    ``row_number ORDER BY c DESC, cid``."""
    cids = [int(cid) for cid, _ in centroids]
    if cids != list(range(len(centroids))):
        raise ValueError(f"ivf_assign expects dense centroid ids 0..k-1, got {cids}")
    # ONE nested-array literal built as SQL text (a single py4j call; the
    # JVM parses it and ConstantFolding collapses it to one Literal) — the
    # previous array-of-struct construction built k×dim individual Literal
    # Columns, and the py4j round-trips to assemble that tree cost ~2 s per
    # kmeans iteration at ANY data size (driver-side, scale-invariant
    # overhead). repr() emits the shortest round-trip decimal, so the parsed
    # double is bit-identical to the driver value.
    cent = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(x)!r}D" for x in cv) + ")" for _, cv in centroids
        )
        + ")"
    )
    e = _to_double(F.col(vec_col))
    # each cosine evaluated exactly ONCE (a fold comparing inside
    # when/otherwise re-evaluates both branches' cosines — ~2× the dot
    # products and a much larger codegen body); array_position returns the
    # FIRST index holding the max, i.e. the lowest cid on exact ties —
    # the same tie rule as the SQL oracle's row_number ORDER BY c DESC, cid
    cos_arr = F.transform(cent, lambda cv: cosine(e, cv))
    pos = F.array_position(cos_arr, F.array_max(cos_arr)).cast("int")
    return emb.withColumn("cluster", pos - F.lit(1))


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = 64,
    decimals: int = 9,
    census: bool = True,
) -> list[tuple[int, list[float], int]]:
    """Fixed-iteration Lloyd (spherical) k-means — the in-engine fit for the
    IVF centroid table (``ivf_centroids`` documents its seed rule as a
    stand-in for exactly this job).  Returns ``[(cid, centroid, n_points)]``
    with ``n_points`` the census under the FITTED centroids.

    Deterministic and oracle-replayable: init = the vectors with
    ``id < k`` (the ``ivf_centroids`` seed rule); each iteration assigns by
    argmax cosine (``ivf_assign`` — lowest cid wins exact ties) and updates
    each centroid to the per-dimension mean of its members, ROUNDED to
    ``decimals`` dp (quantizes away cross-engine summation-order noise,
    ~1e-16, without perturbing the trajectory); empty clusters keep their
    previous centroid.

    Scale shape — the canonical distributed-k-means contract (same as
    MLlib's): per iteration ONE partial-aggregated groupBy over the points
    (map-side combine reduces each partition to ≤k×(dim+1) doubles before
    the shuffle — the shuffle moves O(partitions × k × dim), never O(N));
    driver state is the k×dim centroid table (bounded, like the taxonomy
    map); assignment is the same shuffle-free literal-fold as ``ivf_assign``
    so the points table is scanned iters+1 times and never re-keyed."""
    pts = emb.select(F.col(id_col), _to_double(F.col(vec_col)).alias("e"))
    pts.persist()
    try:
        # ONE job replaces the r5 pair (vector_dim aggregate + ivf_centroids
        # collect): the dim guard's min/max sizes and the k-bounded seed
        # vectors come out of the same aggregate — and it doubles as the
        # cache-warming scan of ``pts``. Same validation errors, same seeds.
        expected = dim
        row = pts.agg(
            F.min(F.size("e")).alias("lo"),
            F.max(F.size("e")).alias("hi"),
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col(id_col) < k,
                        F.struct(
                            F.col(id_col).cast("int").alias("cid"), F.col("e").alias("cv")
                        ),
                    )
                )
            ).alias("seeds"),
        ).first()
        if row is None or row["lo"] is None:
            dim = expected if expected is not None else 0
        else:
            if row["lo"] != row["hi"]:
                raise ValueError(f"ragged {vec_col!r} lengths: {row['lo']}..{row['hi']}")
            if expected is not None and row["lo"] != expected:
                raise ValueError(f"{vec_col!r} has dim {row['lo']}, expected {expected}")
            dim = row["lo"]
        cents = [(int(s["cid"]), [float(x) for x in s["cv"]]) for s in row["seeds"]]
        # the per-dimension means as ONE array-of-aggregates expression (a
        # single py4j call per iteration — dim individual Column objects cost
        # ~1.7 s of driver-side py4j chatter per iteration at any data size)
        ds_expr = F.expr(
            "array("
            + ",".join(f"round(avg(element_at(e, {i + 1})), {decimals})" for i in range(dim))
            + ") AS ds"
        )
        for _ in range(iters):
            agg = (
                ivf_assign(pts, cents, id_col, "e")
                .groupBy("cluster")
                .agg(F.count("*").alias("n"), ds_expr)
                .collect()
            )
            upd = {int(r["cluster"]): [float(x) for x in r["ds"]] for r in agg}
            cents = [(cid, upd.get(cid, cv)) for cid, cv in cents]
        # census under the FITTED centroids (one more assign scan) — callers
        # that only need the centroids (semdedup) skip it: census=False cuts
        # a full assign+groupBy job whose output they never read
        counts: dict[int, int] = {}
        if census:
            counts = {
                int(r["cluster"]): int(r["n"])
                for r in ivf_assign(pts, cents, id_col, "e")
                .groupBy("cluster")
                .agg(F.count("*").alias("n"))
                .collect()
            }
    finally:
        pts.unpersist()
    return [(cid, cv, counts.get(cid, 0)) for cid, cv in cents]


def kmeans_centroid_table(
    emb: DataFrame,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = 64,
) -> DataFrame:
    """``kmeans_fit`` exposed as a long-format DataFrame
    (cid, dim_idx, c_val, n_points) — k×dim rows, bounded by construction
    (the model IS driver-sized; the distributed work already happened in
    the fit's iters+1 scans)."""
    fitted = kmeans_fit(emb, k, iters, id_col, vec_col, dim)
    # values are already 9dp-quantized identically on both engines at every
    # iteration (kmeans_fit ``decimals``) — no re-rounding here (Python's
    # round() is HALF_EVEN, Spark/DuckDB are HALF_UP: a re-round would
    # introduce the only cross-engine divergence in the whole recurrence)
    rows = [
        (int(cid), int(i + 1), float(v), int(n))
        for cid, cv, n in fitted
        for i, v in enumerate(cv)
    ]
    return emb.sparkSession.createDataFrame(
        rows, "cid int, dim_idx int, c_val double, n_points bigint"
    )


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: scan only the ``nprobe`` clusters whose
    centroids are closest to the query (classic inverted-file ANN; the
    LSH-bucketed ``bucketed_ann_topk`` is the hash-partitioned alternative).

    Probe selection is driver-side over the k-row centroid table (bounded,
    like the taxonomy map); the scan side is a partition-prunable equality
    filter + brute-force cosine within ~nprobe/n_centroids of the data."""
    cents = ivf_centroids(emb, n_centroids, id_col, vec_col)
    ranked = sorted(
        cents, key=lambda c: (-_cosine_py(query_vec, c[1]), c[0])
    )
    probe = [cid for cid, _ in ranked[:nprobe]]
    q = _query_literal(query_vec)
    e = _to_double(F.col(vec_col))
    return (
        ivf_assign(emb, cents, id_col, vec_col)
        .where(F.col("cluster").isin(probe))
        .select(F.col(id_col), F.col("cluster"), cosine(e, q).alias("_cos"))
        .orderBy(F.col("_cos").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "cluster", F.round(F.col("_cos"), 6).alias("cosine"))
    )


def semdedup(
    emb: DataFrame,
    threshold: float = 0.35,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = 64,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): k-means-cluster the
    embeddings, then remove every point whose cosine similarity to a
    LOWER-ID point in the SAME cluster exceeds ``threshold`` — the published
    implementation's upper-triangular rule (row i is dropped iff any j < i
    in its cluster has sim > τ, kept points compared against ALL cluster
    members, not just survivors), so the kept set is deterministic and
    order-independent across partitionings.

    Returns every input row as
    ``(vec_id, cluster, max_prior_cos, removed)`` — ``max_prior_cos`` is the
    6-dp max cosine against lower-id cluster-mates (−1.0 when the point is
    its cluster's lowest id) and ``removed`` ∈ {0, 1}; callers keep
    ``removed = 0``.

    Scale shape — the whole point of SemDeDup is that clustering bounds the
    quadratic: the only join is a CLUSTER-KEYED self-join (one shuffle per
    side), so pairwise work is Σ|cluster|², never N²; at 100 TB you scale
    ``k ∝ N`` so the expected cluster size stays constant (the paper uses
    k = 25k for LAION-440M, ~18k points/cluster) and write the assigned
    table bucketed BY ``cluster`` so the self-join is co-located and
    shuffle-free. The fit is ``kmeans_fit`` (map-side-combined, driver
    state = k×dim doubles); assignment is the shuffle-free literal fold of
    ``ivf_assign``; the per-point max is a partial aggregate. A pathological
    hot cluster is capped by raising k — the same knob the paper tunes.
    """
    # census=False: the fit's final census job is dead work here (semdedup
    # reads only the centroids). NOTE a persist of ``assigned`` was measured
    # and REJECTED (r6 A/B: 4.4 s → 6.8 s): in-memory caching of the
    # array<double> column makes every consumer pay nested-row decode and
    # demotes the cluster self-join from AQE runtime broadcast to a shuffle
    # join — recomputing the argmax fold from the parquet scan is cheaper.
    fitted = kmeans_fit(emb, k, iters, id_col, vec_col, dim, census=False)
    cents = [(cid, cv) for cid, cv, _ in fitted]
    # per-row norms hoisted ahead of the cluster self-join (r6): the Σ|c|²
    # pairwise verify folds ONE dot per pair instead of three — the
    # dominant semdedup arithmetic — with bit-identical cosines
    assigned = ivf_assign(emb, cents, id_col, vec_col).select(
        F.col(id_col).alias("vid"),
        "cluster",
        _to_double(F.col(vec_col)).alias("e"),
    ).withColumn("nv", norm(F.col("e")))
    lower = assigned.select(
        F.col("vid").alias("bvid"), "cluster", F.col("e").alias("be"),
        F.col("nv").alias("nb"),
    )
    max_prior = (
        assigned.join(lower, on="cluster")
        .where(F.col("bvid") < F.col("vid"))
        .select(
            "vid",
            F.round(
                cosine_with_norms(F.col("e"), F.col("be"), F.col("nv"), F.col("nb")), 6
            ).alias("c"),
        )
        .groupBy("vid")
        .agg(F.max("c").alias("mc"))
    )
    return (
        assigned.join(max_prior, on="vid", how="left")
        .select(
            F.col("vid").alias(id_col),
            "cluster",
            F.coalesce("mc", F.lit(-1.0)).alias("max_prior_cos"),
            (F.coalesce("mc", F.lit(-1.0)) > F.lit(threshold)).cast("int").alias("removed"),
        )
    )
