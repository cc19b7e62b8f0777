"""Training-data preparation operators (SURVEY §2.7 training ops, entry
point C): the pair-exploded RE table with negative sampling, the NER↔RE
regroup join, and the deterministic train/valid split.

Reference semantics:
- ``t5_finetune_re.py:71-126``: docs with non-empty ``merge_label_1024`` →
  labels = golden triples + ALL unlabeled CKIP pairs surviving in the
  trad doc[:1024] as class 沒有 → shuffled → exploded one row per pair with
  ``id = f"{doc}_{count+1}"``, ``ner_label=[p1,p2]``, ``re_label``.
- ``postprecess.py:302-317`` (``ner_re_merge``): pair-level predictions
  regrouped to document granularity by splitting the id — here a plain
  ``groupBy(url).agg(collect_list(...))`` (J4).
- ``CommonCrawl/data/train/postprecess.py:15-24`` (``split``): 90/10 split
  with a fixed seed — here a hash-mod split on url (deterministic under any
  partitioning, no global sample state; the reference's pandas
  ``sample(random_state=22)`` is machine-local and not reproducible in a
  distributed setting).
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.analysis import generate_pairs
from .parse import TERNARY_DT


def make_training_labels_udf(max_length: int = 1024, seed: int = 22):
    @pandas_udf(TERNARY_DT)
    def labels_udf(
        merge_1024: pd.Series, entities: pd.Series, trad_text: pd.Series, url: pd.Series
    ) -> pd.Series:
        out = []
        for labels, ents, doc, u in zip(merge_1024, entities, trad_text, url):
            labels = [
                (t["subj"], t["obj"], t["rel"])
                for t in (list(labels) if labels is not None else [])
            ]
            doc = (doc or "")[:max_length]
            already = {(s, o) for s, o, _ in labels}
            for pair in generate_pairs(list(ents) if ents is not None else []):
                if pair not in already and pair[0] in doc and pair[1] in doc:
                    labels.append((pair[0], pair[1], "沒有"))
            rng = random.Random(f"{seed}:{u}")
            rng.shuffle(labels)
            out.append([{"subj": s, "obj": o, "rel": r} for s, o, r in labels])
        return pd.Series(out)

    return labels_udf


def re_training_pairs(expanded: DataFrame, max_length: int = 1024, seed: int = 22) -> DataFrame:
    """Pair-exploded RE training table:
    (pair_id, url, subj, obj, re_label, text)."""
    udf = make_training_labels_udf(max_length, seed)
    labeled = (
        expanded.filter(F.size("merge_label_1024") > 0)
        .withColumn(
            "_labels",
            udf(F.col("merge_label_1024"), F.col("ckip_entity"), F.col("trad_text"), F.col("url")),
        )
    )
    return labeled.select(
        "url",
        F.substring("trad_text", 1, max_length).alias("text"),
        F.posexplode("_labels").alias("pos", "t"),
    ).select(
        F.concat_ws("_", F.col("url"), (F.col("pos") + 1).cast("string")).alias("pair_id"),
        "url",
        F.col("t.subj").alias("subj"),
        F.col("t.obj").alias("obj"),
        F.col("t.rel").alias("re_label"),
        "text",
    )


def ner_re_merge(pairs: DataFrame, pred_col: str = "re_label") -> DataFrame:
    """Regroup pair-level predictions to document granularity (J4):
    (url, ner_re_ternary array<struct<subj,obj,rel>>)."""
    return (
        pairs.groupBy("url")
        .agg(
            F.collect_list(
                F.struct(
                    F.least("subj", "obj").alias("subj"),
                    F.greatest("subj", "obj").alias("obj"),
                    F.col(pred_col).alias("rel"),
                )
            ).alias("ner_re_ternary")
        )
    )


def train_valid_split(df: DataFrame, valid_fraction: float = 0.1, key: str = "url"):
    """Deterministic split via hash-mod on the key (P7 analog)."""
    buckets = max(int(round(1 / valid_fraction)), 2)
    is_valid = F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)) == 0
    return df.where(~is_valid), df.where(is_valid)


def _md5_rank_hash(key, seed: str):
    """Deterministic 60-bit rank hash — md5-derived so the DuckDB oracle
    reproduces it bit-for-bit (same recipe as operators/dedup.py)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.col(key).cast("string"), F.lit(":" + seed))), 1, 15),
        16,
        10,
    ).cast("long")


def hash_balanced_sample(
    df: DataFrame,
    is_positive,
    key: str,
    seed: str = "22",
    range_shift: int = 52,
) -> DataFrame:
    """P7 — all positives + an equal-count deterministic sample of negatives
    (reference: class-balanced train set, deck 20240412 slide 9
    20,583 pos + 20,583 sampled neg; ``t5_finetune_re.py`` builds the
    negatives, the balance sample picks among them).

    The sample is the first ``n_pos`` negatives in global ``(hash(key), key)``
    order — reproducible under any partitioning (the reference's pandas
    ``sample(random_state=22)`` is machine-local). Scale shape: NO global
    sort — the rank is computed two-phase: (1) range-bucket on the top hash
    bits (monotone in the hash, so per-bucket order concatenates to global
    order), (2) per-bucket counts (≤256 scalars to the driver) become rank
    offsets, (3) a window rank WITHIN each bucket + offset gives the exact
    global rank. The only wide op is the bucketed window — one shuffle on a
    uniform key.
    """
    # NULL-predicate contract, made explicit: a row where ``is_positive``
    # evaluates to NULL belongs to NEITHER class (three-valued logic would
    # silently drop it from both ``where`` branches) — coalescing pins that
    # behavior visibly: NULL-predicate rows are treated as negatives.
    is_positive = F.coalesce(is_positive, F.lit(False))
    pos = df.where(is_positive)
    # NULL keys cannot be hash-ranked (md5(NULL) is NULL); excluding them is
    # the documented contract — they would otherwise poison the driver-side
    # bucket map and silently never be sampled
    neg = df.where(~is_positive).where(F.col(key).isNotNull())

    h = _md5_rank_hash(key, seed)
    bucketed = neg.withColumn("_h", h).withColumn(
        "_bk", F.shiftright(F.col("_h"), range_shift)
    )
    # ONE counting scan (r6): the positive count rides the negative bucket
    # histogram as the sentinel group -1 (bucket ids are ≥ 0), instead of a
    # separate pos.count() job — same n_pos, same per-bucket counts
    grp = (
        F.when(is_positive, F.lit(-1).cast("long"))
        .when(F.col(key).isNotNull(), F.shiftright(_md5_rank_hash(key, seed), range_shift))
    )
    count_rows = (
        df.select(grp.alias("_g"))
        .where(F.col("_g").isNotNull())
        .groupBy("_g")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    n_pos = 0
    counts = {}
    for r in count_rows:
        if r["_g"] == -1:
            n_pos = r["n"]
        else:
            counts[r["_g"]] = r["n"]
    offsets, acc = {}, 0
    for bk in sorted(counts):
        offsets[bk] = acc
        acc += counts[bk]
    if not offsets:
        return pos
    offset_col = F.element_at(
        F.create_map(
            *[
                c
                for bk, off in offsets.items()
                for c in (F.lit(int(bk)).cast("long"), F.lit(int(off)).cast("long"))
            ]
        ),
        F.col("_bk"),
    )

    from pyspark.sql.window import Window

    w = Window.partitionBy("_bk").orderBy("_h", key)
    sampled = (
        bucketed.withColumn("_rk", F.row_number().over(w) + offset_col)
        .where(F.col("_rk") <= n_pos)
        .drop("_h", "_bk", "_rk")
    )
    return pos.unionByName(sampled)


def class_balanced_pairs(
    pairs: DataFrame,
    label_col: str = "re_label",
    key: str = "pair_id",
    negative_class: str = "沒有",
    seed: str = "22",
) -> DataFrame:
    """Class-balanced RE training table: every labeled pair + an equal-count
    deterministic sample of the 沒有 negatives."""
    return hash_balanced_sample(
        pairs, F.col(label_col) != negative_class, key=key, seed=seed
    )


def per_key_cap(
    df: DataFrame,
    key: str = "source",
    id_col: str = "doc_id",
    cap: int = 100,
    seed: str = "cap",
    bucket_shift: int = 54,
) -> DataFrame:
    """Per-domain document cap — the C4/RefinedWeb-style curation step that
    bounds any one domain's contribution to the corpus: keep the first
    ``cap`` docs per ``key`` in deterministic ``(md5-hash, id)`` order (a
    seeded uniform shuffle, reproducible under any partitioning). Returns
    the surviving rows plus their 1-based ``cap_rank`` within the key.

    Scale shape — NO window over the raw domain key (a hot domain like a
    link farm with 10^8 pages would serialize that window's sort on one
    task). The rank hash's high bits range-bucket each domain into
    ``2^(60-bucket_shift)`` slices (bucket-major order == hash order, so
    per-slice ranks concatenate exactly):
      1. per-(key, bucket) counts — a tiny aggregate, partial map-side;
      2. running-count offsets via a window over the COUNTS table (≤64
         rows per key, bounded, never data-skewed) — all distributed, no
         driver collect (contrast hash_balanced_sample's driver bucket
         map, fine there because buckets are global);
      3. buckets whose offset already reaches ``cap`` are dropped BEFORE
         the data-side window — with a web-scale domain and a small cap,
         ~all of its rows never enter a sort;
      4. row_number within (key, bucket) + offset = exact global-in-key
         rank; keep rank ≤ cap.
    Rows with a NULL key or id cannot be hash-ranked and are excluded
    (documented contract, as in hash_balanced_sample).

    ``cap`` may also be a DataFrame of per-key quotas ``(key, cap)`` — the
    same skew-proof rank, but each key keeps its own first-``cap_k`` slice
    (used by ``language_mix_sample``'s temperature quotas). The quota table
    is keyspace-bounded (tiny), so its joins AQE-broadcast at runtime.
    """
    if not 0 <= bucket_shift < 60:
        raise ValueError("bucket_shift must be in [0, 60)")
    base = df.where(F.col(key).isNotNull() & F.col(id_col).isNotNull())
    bucketed = base.withColumn("_h", _md5_rank_hash(id_col, seed)).withColumn(
        "_bk", F.shiftright(F.col("_h"), bucket_shift)
    )
    from pyspark.sql.window import Window

    if isinstance(cap, DataFrame):
        caps = cap.select(key, F.col("cap").cast("long").alias("_cap"))
    else:
        caps = None
    counts = bucketed.groupBy(key, "_bk").agg(F.count("*").alias("_n"))
    w_off = (
        Window.partitionBy(key)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        key, "_bk", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    if caps is None:
        offsets = offsets.where(F.col("_off") < cap)
    else:
        offsets = offsets.join(caps, key).where(F.col("_off") < F.col("_cap"))
    w_local = Window.partitionBy(key, "_bk").orderBy("_h", id_col)
    ranked = (
        bucketed.join(offsets, [key, "_bk"])
        .withColumn("cap_rank", F.row_number().over(w_local) + F.col("_off"))
    )
    keep = F.col("cap_rank") <= (cap if caps is None else F.col("_cap"))
    return ranked.where(keep).drop("_h", "_bk", "_off", *(["_cap"] if caps is not None else []))


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    budget: int = 256,
    shard_size: int = 64,
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay the corpus's token stream out
    in deterministic ``id`` order and cut it into fixed-``budget`` training
    sequences (the GPT-style packing that turns variable-length documents
    into dense model inputs; docs may span a sequence boundary — that is
    the semantics, not a bug).  Emits per doc: ``n_tokens``,
    ``start_offset`` (global exclusive prefix sum), ``seq_id``
    (``start_offset DIV budget``) and ``pos_in_seq``.

    Scale shape — the prefix sum is computed WITHOUT a global sort/window
    (a single unbounded window over 10^12 rows would serialize on one
    task).  ``id DIV shard_size`` range-buckets the stream order-preserving:

      1. per-shard token sums — a tiny aggregate (``n_docs/shard_size``
         rows), partial map-side;
      2. shard offsets via one running-sum window over the COUNTS table
         (bounded rows, never data-skewed — same discipline as
         ``per_key_cap``); no driver collect;
      3. the data-side window ranks only WITHIN a shard (≤ ``shard_size``
         rows per partition, bounded), joined to its shard offset (AQE
         broadcasts the tiny offsets side at runtime).

    ``id_col`` must be numeric and non-null (documented contract; rows with
    NULL id are excluded like ``per_key_cap``).  If ``tokens_col`` is None
    the BPE-ish regex count of ``text_col`` is used."""
    from pyspark.sql.window import Window

    from .textstats import bpe_token_count

    n_tok = (
        F.col(tokens_col) if tokens_col else bpe_token_count(F.col(text_col))
    ).cast("long")
    base = (
        df.where(F.col(id_col).isNotNull())
        .select(F.col(id_col), n_tok.alias("n_tokens"))
        .withColumn("_shard", F.expr(f"{id_col} DIV {shard_size}"))
    )
    sums = base.groupBy("_shard").agg(F.sum("n_tokens").alias("_sn"))
    w_sh = Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.select(
        "_shard", F.coalesce(F.sum("_sn").over(w_sh), F.lit(0).cast("long")).alias("_off")
    )
    w_loc = (
        Window.partitionBy("_shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w_loc), F.lit(0).cast("long")) + F.col("_off")
    return (
        base.join(offsets, "_shard")
        .withColumn("start_offset", start)
        .withColumn("seq_id", F.expr(f"start_offset DIV {budget}"))
        .withColumn("pos_in_seq", F.col("start_offset") % budget)
        .drop("_shard", "_off")
    )


def priority_sample(
    df: DataFrame,
    weight,
    key: str,
    k: int,
    seed: str = "31",
) -> DataFrame:
    """Weighted sampling without replacement via PRIORITY SAMPLING
    (Duffield-Lund-Thorup, JACM 2007): each row gets priority q = w / u with
    u a deterministic uniform in (0, 1] derived from md5(key:seed); the
    sample is the k rows of highest priority, and every sampled row carries
    the unbiased subset-sum estimator weight est_w = max(w, tau) where tau
    is the (k+1)-th highest priority. Sum(est_w) over the sample is an
    unbiased estimate of sum(w) over the corpus — the quality-weighted
    doc-sampling primitive a training-data pipeline needs ("sample 1B docs
    proportional to quality score, keep reweighting exact").

    Determinism & oracle parity: u = (h+1)/2^32 with h the first 8 md5 hex
    digits (exact in IEEE — division by a power of two), the threshold
    t = u / w is ONE correctly-rounded division, and tau = 1/t_(k+1) + a
    GREATEST — every double is bit-identical between Spark and DuckDB, so
    the driver's value hash needs no rounding at all.

    Scale shape: the top-(k+1) is a TakeOrdered (per-partition heaps + one
    k-sized merge at the driver — NO global sort, NO shuffle of the corpus);
    tau is a scalar off a bounded (k+1)-row frame (centroid-collect
    discipline). Rows with NULL key or non-positive weight are excluded by
    documented contract (they have no defined priority)."""
    w = weight.cast("double")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key).cast("string"), F.lit(":" + seed))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    thr = ((h + F.lit(1.0)) / F.lit(4294967296.0)) / w
    scored = (
        df.where(F.col(key).isNotNull())
        .select(F.col(key), w.alias("w"), thr.alias("_thr"))
        .where(F.col("w") > 0)
    )
    # ONE TakeOrdered corpus scan (r5 ran it twice — once for the fence, once
    # for the sample): the ≤(k+1)-row top frame is localCheckpointed and both
    # the fence scalar and the k-row sample derive from it (r5 verdict nit).
    top = scored.orderBy("_thr", key).limit(k + 1).localCheckpoint()
    fence = top.agg(F.count("*").alias("n"), F.max("_thr").alias("t")).first()
    if int(fence["n"]) <= k:
        # fewer than k+1 rows: whole corpus is the sample, est_w = w exactly
        return top.select(key, "w", F.col("w").alias("est_w"))
    tau = 1.0 / float(fence["t"])
    return (
        top.orderBy("_thr", key)
        .limit(k)
        .select(key, "w", F.greatest("w", F.lit(tau)).alias("est_w"))
    )
