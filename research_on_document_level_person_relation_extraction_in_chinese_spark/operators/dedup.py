"""Deduplication operators for training-data pipelines (driver mandate):
exact (hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard.

Design constraints honored throughout:
- **JVM-only hot path.** Shingling, hashing, signatures, banding are all
  built-in higher-order functions (``transform``/``aggregate``/``sequence``)
  — no Python UDFs, so dedup scans stay inside whole-stage codegen.
- **Oracle-exact arithmetic.** Shingle hash = first 15 hex chars of md5 →
  int64 → mod P; both Spark (``conv``) and DuckDB (``'0x…'::BIGINT``)
  produce identical values, so every operator has an exact SQL oracle.
- **Scale shape.** LSH banding turns the quadratic all-pairs problem into
  per-bucket joins: candidate generation is one groupBy on (band, signature)
  whose fan-out is bounded by bucket size; the exact-Jaccard verify runs only
  on candidates. At 100 TB the band groupBy is the only big shuffle and its
  key space is uniform (hash values), so no skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_MOD = 1_000_000_007
#: (a, b) parameters of the k minhash permutations h_i(x) = (a*x + b) mod P.
#: a < 2^31 keeps a*x below int64 overflow after x is reduced mod P.
MINHASH_SALTS = [
    (1_000_003, 12345),
    (999_983, 54321),
    (1_000_033, 7),
    (999_979, 999_331),
    (1_000_037, 271_828),
    (999_961, 314_159),
    (1_000_039, 161_803),
    (999_959, 423_606),
]


def char_shingles(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams (array<string>); empty for short texts."""
    length = F.length(text)
    return F.when(
        length >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), length - (n - 1)), lambda i: text.substr(i, F.lit(n))
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_hash(shingle: Column) -> Column:
    """md5-derived 60-bit int reduced mod P — identical in the DuckDB oracle:
    ``CAST('0x' || substr(md5(s),1,15) AS BIGINT) % 1000000007``."""
    return F.conv(F.substring(F.md5(shingle), 1, 15), 16, 10).cast("long") % HASH_MOD


def _permute(a: int, b: int):
    """h → (a*h + b) mod P as a 1-arg HOF lambda (Spark's higher-order
    functions require the exact lambda arity — no default-arg captures)."""
    return lambda h: (F.lit(a) * h + F.lit(b)) % HASH_MOD


def minhash_signature(shingles: Column, k: int = 8) -> Column:
    """array of k minhash values (NULL-free; empty shingle set → P as the
    'infinite' sentinel so signatures stay comparable)."""
    hashes = F.transform(shingles, shingle_hash)
    mins = [
        F.coalesce(F.array_min(F.transform(hashes, _permute(a, b))), F.lit(HASH_MOD))
        for a, b in MINHASH_SALTS[:k]
    ]
    return F.array(*mins)


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content-hash groupBy → duplicate groups."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.6,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH + exact-Jaccard verify.

    shingle → k minhashes → ``bands`` bands of k/bands rows → bucket-join on
    (band, band signature) → candidate pairs → exact n-gram Jaccard filter.
    Returns (a_id, b_id, jaccard) with a_id < b_id, rounded to 4 decimals.
    """
    rows_per_band = k // bands
    base = docs.select(
        F.col(id_col).alias("id"), char_shingles(F.col(text_col), n).alias("sh")
    ).withColumn("sig", minhash_signature(F.col("sh"), k))

    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.slice("sig", b * rows_per_band + 1, rows_per_band).alias("bsig"),
        )
        for b in range(bands)
    ]
    buckets = base.select("id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.bsig").alias("bsig")
    )
    left = buckets.alias("l")
    right = buckets.alias("r")
    cand = (
        left.join(right, on=["band", "bsig"])
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a_id"), F.col("r.id").alias("b_id"))
        .distinct()
    )
    # exact-Jaccard verify via the inverted index: candidate pairs joined to
    # the exploded shingle table twice and counted — no shingle ARRAYS ever
    # shuffle to the pair side (candidates × |shingles| stays columnar rows)
    sh_flat = base.select(F.col("id"), F.explode("sh").alias("s"))
    a_sh = sh_flat.select(F.col("id").alias("a_id"), F.col("s"))
    b_sh = sh_flat.select(F.col("id").alias("b_id"), F.col("s"))
    n_common = (
        cand.join(a_sh, "a_id")
        .join(b_sh, ["b_id", "s"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_common"))
    )
    sizes = F.broadcast(base.select("id", F.size("sh").alias("n_sh")))
    joined = (
        n_common.join(sizes.withColumnRenamed("id", "a_id").withColumnRenamed("n_sh", "a_sz"), "a_id")
        .join(sizes.withColumnRenamed("id", "b_id").withColumnRenamed("n_sh", "b_sz"), "b_id")
    )
    union = F.col("a_sz") + F.col("b_sz") - F.col("n_common")
    return (
        joined.withColumn("jaccard", F.round(F.col("n_common").cast("double") / union, 4))
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    block_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Blocked n-gram Jaccard via the inverted-index set-similarity join
    (the MapReduce-era standard — explode distinct shingles, equi-join on
    (block, shingle), count co-occurrences, derive Jaccard from set sizes).

    Scale shape: no array cross-join ever materializes — the shuffle keys are
    (block, shingle) and the aggregation is partial (map-side combined).
    Known refinement for adversarial data: hot shingles fan out; prefix
    filtering (sort shingles by global frequency, join only on each set's
    rarest ⌈(1-θ)|A|⌉+1 shingles) bounds that — not needed at current data.
    """
    sh = docs.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id"),
        F.explode(char_shingles(F.col(text_col), n)).alias("sh"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, on=["blk", "sh"])
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count("*").alias("n_common"))
    )
    sz = F.broadcast(sizes)
    joined = (
        inter.join(sz.withColumnRenamed("id", "a_id").withColumnRenamed("n_sh", "a_sz"), "a_id")
        .join(sz.withColumnRenamed("id", "b_id").withColumnRenamed("n_sh", "b_sz"), "b_id")
    )
    union = F.col("a_sz") + F.col("b_sz") - F.col("n_common")
    return (
        joined.withColumn("jaccard", F.round(F.col("n_common").cast("double") / union, 4))
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def simhash(text: Column, n: int = 2, bits: int = 16) -> Column:
    """``bits``-bit SimHash over n-gram hashes: bit j set iff the sum of
    (2*((h>>j)&1) - 1) over all shingles is positive. Pure JVM arithmetic,
    reproduced verbatim in the SQL oracle."""
    hashes = F.transform(char_shingles(text, n), shingle_hash)

    def _bit_weight(j: int):
        # (h >> j) & 1 expressed as floor(h / 2^j) % 2 — exact for the
        # non-negative mod-P hashes and 1-arg-lambda-safe
        return lambda acc, h: acc + (
            (F.floor(h / F.lit(float(1 << j))).cast("long") % 2) * 2 - 1
        )

    out = F.lit(0).cast("long")
    for j in range(bits):
        weight = F.aggregate(hashes, F.lit(0).cast("long"), _bit_weight(j))
        out = out + F.when(weight > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_duplicate_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """Docs sharing an identical SimHash fingerprint (cheap near-dup signal;
    banded hamming joins are the scale-out refinement)."""
    return (
        docs.select(F.col(id_col).alias("id"), simhash(F.col(text_col), bits=bits).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )
