"""Interleaved A/B of r6 operator optimizations vs their r5 shapes, in ONE
session (tenant noise hits both arms equally). Old shapes are inlined from
the r5 tip; new shapes are the live operators. Usage:
    SPARK_GRAFT_SF_DIR=... python scripts/ab_r6.py [rounds] [case ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from bench import _noop_run, _warmup  # noqa: E402
from research_on_document_level_person_relation_extraction_in_chinese_spark import (  # noqa: E402
    get_spark,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators import (  # noqa: E402
    persistpool,
)


def t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


# ---- old (r5) shapes, inlined -------------------------------------------

def old_hll(spark, sf_dir):
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.curation import (
        word_ngrams,
    )
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    docs = entry_mod._t(spark, sf_dir, "documents")
    grams = docs.select(F.explode(word_ngrams(F.col("text"), 3)).alias("gram"))
    est = hll_estimate(hll_registers(grams, "gram", 8), 8)
    exact = grams.agg(F.count_distinct("gram").cast("long").alias("n_exact"))
    return est.crossJoin(exact).select(
        "n_registers", "hll_estimate", "n_exact",
        F.round((F.col("hll_estimate") - F.col("n_exact")) / F.col("n_exact").cast("double") * 100.0, 2).alias("rel_err_pct"),
    )


def old_countmin(spark, sf_dir):
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.sketches import (
        _tokens,
        countmin_estimate,
        countmin_sketch,
    )

    docs = entry_mod._t(spark, sf_dir, "documents")
    toks = _tokens(docs, "text")
    sketch = countmin_sketch(toks, 4, 16)
    top = (
        toks.groupBy("token").agg(F.count("*").alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("token")).limit(20)
    )
    est = countmin_estimate(top.select("token"), sketch, 4, 16)
    return top.join(est, on="token").select(
        "token", "exact_count", "est_count",
        (F.col("est_count") - F.col("exact_count")).alias("overcount"),
    )


def old_lm(spark, sf_dir):
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.lm import (
        _map_literal,
        char_bigrams,
        train_char_bigram_lm,
    )

    docs = entry_mod._t(spark, sf_dir, "documents")
    reference = docs.where(F.col("doc_id") % 41 == 0)
    lnp, lnden, lnv = train_char_bigram_lm(reference, "text", 200_000)
    pmap = _map_literal(lnp)
    dmap = _map_literal(lnden)

    def step(acc, bg):
        fallback = -F.coalesce(F.element_at(dmap, bg["a"]), F.lit(lnv))
        return acc + F.coalesce(F.element_at(pmap, F.concat(bg["a"], bg["b"])), fallback)

    bgs = char_bigrams(F.col("text"))
    return (
        docs.select(
            F.col("doc_id"), F.col("lang"),
            F.size(bgs).cast("long").alias("n_bigrams"),
            F.aggregate(bgs, F.lit(0.0), step).alias("_s"),
        )
        .where(F.col("n_bigrams") > 0)
        .select("doc_id", "lang", "n_bigrams",
                F.round(F.exp(-F.col("_s") / F.col("n_bigrams")), 4).alias("ppl"))
    )


class no_pool:
    """Context manager: disable managed persists (restores the r5 no-persist
    shape for operators whose only r6 change is the persist)."""

    def __enter__(self):
        import research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup as dd

        self._dd_mod = dd
        self._scan, self._extra = persistpool.persist_scan, persistpool.persist_extra
        self._dd = dd._persist_scan, dd._persist_extra
        persistpool.persist_scan = lambda df: df
        persistpool.persist_extra = lambda df: df
        dd._persist_scan = lambda df: df
        dd._persist_extra = lambda df: df
        return self

    def __exit__(self, *a):
        persistpool.persist_scan, persistpool.persist_extra = self._scan, self._extra
        self._dd_mod._persist_scan, self._dd_mod._persist_extra = self._dd
        return False


def old_semdedup(spark, sf_dir):
    from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.simsearch import (
        _to_double,
        cosine,
        ivf_assign,
        kmeans_fit,
    )

    emb = entry_mod._t(spark, sf_dir, "embeddings")
    fitted = kmeans_fit(emb, 8, 2, "vec_id", "embedding", 64, census=True)
    cents = [(cid, cv) for cid, cv, _ in fitted]
    assigned = ivf_assign(emb, cents, "vec_id", "embedding").select(
        F.col("vec_id").alias("vid"), "cluster", _to_double(F.col("embedding")).alias("e")
    )
    lower = assigned.select(F.col("vid").alias("bvid"), "cluster", F.col("e").alias("be"))
    max_prior = (
        assigned.join(lower, on="cluster")
        .where(F.col("bvid") < F.col("vid"))
        .select("vid", F.round(cosine(F.col("e"), F.col("be")), 6).alias("c"))
        .groupBy("vid").agg(F.max("c").alias("mc"))
    )
    return assigned.join(max_prior, on="vid", how="left").select(
        F.col("vid").alias("vec_id"), "cluster",
        F.coalesce("mc", F.lit(-1.0)).alias("max_prior_cos"),
        (F.coalesce("mc", F.lit(-1.0)) > F.lit(0.35)).cast("int").alias("removed"),
    )


def old_prefix(spark, sf_dir):
    from pyspark.sql.window import Window

    import research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup as dd

    docs = entry_mod._open_vocab_docs(spark, sf_dir)
    sh = docs.select(
        F.col("grp").alias("blk"), F.col("doc_id").alias("id"),
        F.explode(dd.char_shingles(F.col("text"), 3)).alias("sh"),
    )
    sh = dd._persist_scan(sh)
    threshold = 0.8
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    freq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy("df", "sh")
    prefix = (
        sh.join(freq, "sh")
        .withColumn("_rk", F.row_number().over(w))
        .join(sizes, "id")
        .where(F.col("_rk") <= F.floor((1.0 - threshold) * F.col("n_sh")) + 1)
        .select("blk", "id", "sh")
    )
    pa, pb = prefix.alias("a"), prefix.alias("b")
    cand = (
        pa.join(pb, on=["blk", "sh"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )
    doc_sets = sh.groupBy("id").agg(
        F.collect_list("sh").alias("shs"), F.count("*").alias("n_sh")
    )
    counts = (
        cand.join(
            doc_sets.select(F.col("id").alias("a_id"), F.col("shs").alias("a_shs"), F.col("n_sh").alias("a_sz")),
            "a_id",
        )
        .join(
            doc_sets.select(F.col("id").alias("b_id"), F.col("shs").alias("b_shs"), F.col("n_sh").alias("b_sz")),
            "b_id",
        )
        .select(
            "a_id", "b_id",
            F.size(F.array_intersect("a_shs", "b_shs")).cast("long").alias("n_common"),
            "a_sz", "b_sz",
        )
    )
    return dd._jaccard_select(counts, threshold)


def old_paragraph(spark, sf_dir):
    import research_on_document_level_person_relation_extraction_in_chinese_spark.operators.dedup as dd

    docs = entry_mod._paragraph_docs(spark, sf_dir)
    paras = docs.select(
        F.col("doc_id"),
        F.posexplode(F.split(F.col("text"), "\n", -1)).alias("idx", "para"),
    )
    norm = F.lower(F.trim(F.col("para")))
    keyed = paras.select(
        "doc_id", "idx", "para",
        F.md5(norm).alias("k"),
        (F.length(norm) >= 10).alias("is_long"),
    )
    keyed = dd._persist_scan(keyed)
    firsts = (
        keyed.where("is_long")
        .groupBy("k")
        .agg(F.min(F.struct("doc_id", "idx")).alias("f"))
    )
    kept = (
        keyed.join(firsts, "k", "left")
        .where(
            (~F.col("is_long"))
            | ((F.col("f.doc_id") == F.col("doc_id")) & (F.col("f.idx") == F.col("idx")))
        )
        .select("doc_id", "idx", "para")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda s: s["para"],
            ),
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    n_orig = keyed.groupBy("doc_id").agg(F.count("*").alias("n_orig"))
    return (
        n_orig.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text", F.lit("")).alias("text"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_orig") - F.coalesce("n_kept", F.lit(0))).alias("n_dropped"),
        )
    )


CASES = {
    "hll_ngrams": (old_hll, "hll_ngrams"),
    "paragraph_dedup": (old_paragraph, "paragraph_dedup"),
    "countmin_audit": (old_countmin, "countmin_audit"),
    "lm_perplexity": (old_lm, "lm_perplexity"),
    "semdedup": (old_semdedup, "semdedup"),
    "ngram_jaccard_prefix": (old_prefix, "ngram_jaccard_prefix"),
}
# persist-only cases: old = new shape with the pool disabled
POOL_CASES = ["dsir_select", "bm25_topk", "bloom_decontaminate",
              "embedding_near_dups", "ann_banded_near_dups"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or 32)
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = set(sys.argv[2:])
    spark = get_spark("ab-r6", cores=cpus, shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark, cpus)
    qs = entry_mod.queries()
    out: dict[str, dict] = {}
    # clearCache before EVERY run: Spark's CacheManager plan-matches
    # identical subtrees, so without it the old arm silently reads the new
    # arm's persisted blocks (and vice versa across iterations)
    for name, (old_fn, qname) in CASES.items():
        if only and name not in only:
            continue
        olds, news = [], []
        for _ in range(rounds):
            spark.catalog.clearCache()
            olds.append(t(lambda: _noop_run(old_fn(spark, sf_dir))))
            spark.catalog.clearCache()
            news.append(t(lambda: _noop_run(qs[qname](spark, sf_dir))))
        out[name] = {"old_best": min(olds), "new_best": min(news),
                     "old": olds, "new": news}
        print(json.dumps({name: out[name]}), flush=True)
    for name in POOL_CASES:
        if only and name not in only:
            continue
        olds, news = [], []
        for _ in range(rounds):
            spark.catalog.clearCache()
            with no_pool():
                olds.append(t(lambda: _noop_run(qs[name](spark, sf_dir))))
            spark.catalog.clearCache()
            news.append(t(lambda: _noop_run(qs[name](spark, sf_dir))))
        out[name] = {"old_best": min(olds), "new_best": min(news),
                     "old": olds, "new": news}
        print(json.dumps({name: out[name]}), flush=True)


if __name__ == "__main__":
    main()
