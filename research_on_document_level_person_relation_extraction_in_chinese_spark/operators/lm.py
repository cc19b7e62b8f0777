"""Character-bigram LM perplexity scoring — the CCNet quality signal
(Wenzek et al. 2020 score documents with a Wikipedia-trained KenLM and
bucket by perplexity; ``curation.ccnet_buckets`` consumes the score this
module produces).

Model: add-1-smoothed char-bigram LM trained on a REFERENCE slice of the
corpus — p(b|a) = (c(ab)+1) / (c(a)+V) with V = distinct reference chars
+ 1 (the OOV symbol); an unseen bigram backs off to 1/(c(a)+V) (c(a)=0
for unseen contexts, i.e. 1/V).  Char-level keeps the model honest on
Chinese text where whitespace tokenization is meaningless.

Scale shape: training is ONE partial-aggregated groupBy over reference
bigrams (model size is vocabulary²-bounded, NOT corpus-bounded — the same
contract as the taxonomy map, guarded by ``max_model_size``); the model
ships back as two map literals (ln-prob per seen bigram, ln-denominator
per seen context), so SCORING is a pure map — each doc folds its own
bigrams in text order through ``element_at`` on the literals, no join, no
shuffle, scan speed at 100 TB.  A vocabulary too big for a literal should
switch to a broadcast join of the model table — same math, one extra
(broadcast) join; the guard makes that decision explicit rather than
silent.

Deterministic and DuckDB-replayable: counts are exact integers, the
per-bigram ln is the same libm call on both engines (the ``dsir``
precedent), and the per-doc sum is an ORDERED fold over text order, so
perplexities match to the last bit before the 4-dp round.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_bigrams_from_chars(cs: Column) -> Column:
    """array<struct<a,b>> of adjacent char pairs, in text order, over a
    PRE-HOISTED char array (``split(text, '')``). Hot paths hoist the char
    split to its own projected column: Catalyst re-aliases lambda variables
    per occurrence (no CSE across copies), so an embedded split re-runs the
    full-text char split once per reference — ~4x inside this expression
    alone, ~8x when the caller also sizes the bigram array."""
    n = F.size(cs)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(cs, 1, n - 1),
            F.slice(cs, 2, n - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def char_bigrams(text: Column) -> Column:
    """Embedded-form char bigrams (char split inlined per reference) — the
    simple Column API; hot paths hoist via ``char_bigrams_from_chars``."""
    return char_bigrams_from_chars(F.split(text, ""))


def train_char_bigram_lm(
    reference: DataFrame, text_col: str = "text", max_model_size: int = 200_000
) -> tuple[dict[str, float], dict[str, float], float]:
    """Fit the smoothed LM on ``reference`` → (ln-prob per seen bigram,
    ln(c(a)+V) per seen context, ln(V) fallback).  One bounded groupBy +
    collect; raises if the model outgrows the literal-shipping guard."""
    pairs = (
        reference.select(F.split(F.col(text_col), "").alias("_cs"))
        .select(F.explode(char_bigrams_from_chars(F.col("_cs"))).alias("bg"))
        .select(F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))
    )
    counts = pairs.groupBy("a", "b").agg(F.count("*").alias("c")).collect()
    if len(counts) > max_model_size:
        raise ValueError(
            f"bigram model has {len(counts)} entries > max_model_size="
            f"{max_model_size}; switch scoring to the broadcast-join path"
        )
    ctx: dict[str, int] = {}
    vocab: set[str] = set()
    for r in counts:
        ctx[r["a"]] = ctx.get(r["a"], 0) + int(r["c"])
        vocab.add(r["a"])
        vocab.add(r["b"])
    v = len(vocab) + 1  # + OOV
    lnp = {
        r["a"] + r["b"]: math.log((int(r["c"]) + 1) / (ctx[r["a"]] + v))
        for r in counts
    }
    lnden = {a: math.log(c + v) for a, c in ctx.items()}
    return lnp, lnden, math.log(v)


def _index_map_literal(chars: list[str]) -> Column:
    """char → 1-based index as ONE small map literal (SQL text, single py4j
    call; the probe is linear in |vocab|, which is why the scoring values
    live in dense arrays, not maps)."""
    if not chars:
        return F.expr("map()")

    def q(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    entries = ",".join(f"{q(c)},{i + 1}" for i, c in enumerate(chars))
    return F.expr(f"map({entries})")


def _map_literal(d: dict[str, float]) -> Column:
    """dict → ONE map literal via SQL text (single py4j call; repr() emits
    round-trip-exact doubles). Keys are quoted as SQL strings."""
    if not d:
        return F.expr("map()")

    def q(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    entries = ",".join(f"{q(k)},{float(val)!r}D" for k, val in sorted(d.items()))
    return F.expr(f"map({entries})")


def lm_perplexity(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = ("lang",),
    max_model_size: int = 200_000,
) -> DataFrame:
    """Score every doc's char-bigram perplexity under the reference LM →
    ``(id, *extra_cols, n_bigrams, ppl)`` with ppl = exp(−mean ln p),
    rounded to 4 dp; docs shorter than one bigram are excluded (undefined
    perplexity)."""
    lnp, lnden, lnv = train_char_bigram_lm(reference, text_col, max_model_size)

    # Scoring lookup (r6): Spark evaluates ``element_at`` on a MAP literal by
    # LINEAR key scan (ArrayBasedMapData has no hash index), so the r5 shape
    # paid O(|model|) string compares per bigram — the dominant cost of the
    # scoring pass. With single-char vocab (the normal case) the same doubles
    # are instead laid out in a dense (context × next-char) array literal:
    # two SMALL char→index map probes (O(|vocab|) ≪ O(|vocab|²)) + one O(1)
    # array index. Values are bit-identical: the flat array stores exactly
    # lnp[a+b] where seen and −lnden[a] otherwise, and −lnv for unseen
    # contexts — the identical IEEE doubles the map path produced, added in
    # the identical text-order fold.
    single_char = bool(lnden) and all(len(a) == 1 for a in lnden) and all(
        len(k) == 2 for k in lnp
    )
    if single_char:
        ctx_chars = sorted(lnden)
        b_chars = sorted({k[1] for k in lnp}) or ctx_chars
        nb = len(b_chars)
        flat = [
            lnp.get(a + bch, -lnden[a]) for a in ctx_chars for bch in b_chars
        ]
        den_neg = [-lnden[a] for a in ctx_chars]
        flat_lit = F.expr("array(" + ",".join(f"{v!r}D" for v in flat) + ")")
        den_lit = F.expr("array(" + ",".join(f"{v!r}D" for v in den_neg) + ")")
        ctx_map = _index_map_literal(ctx_chars)
        b_map = _index_map_literal(b_chars)

        def step(acc: Column, bg: Column) -> Column:
            # explicit when-branches keep every element_at index NON-NULL —
            # a null-index element_at inside coalesce miscompiles under the
            # ANSI null-propagation rewrite (folded the whole coalesce to
            # null; observed on 4.1.2)
            ia = F.element_at(ctx_map, bg["a"])
            ib = F.element_at(b_map, bg["b"])
            val = (
                F.when(ia.isNull(), F.lit(-lnv))
                .when(ib.isNull(), F.element_at(den_lit, ia))
                .otherwise(F.element_at(flat_lit, (ia - 1) * nb + ib))
            )
            return acc + val

    else:  # degenerate vocab (empty/multi-code-unit chars): map-literal path
        pmap = _map_literal(lnp)
        dmap = _map_literal(lnden)

        def step(acc: Column, bg: Column) -> Column:
            fallback = -F.coalesce(
                F.element_at(dmap, bg["a"]), F.lit(lnv)
            )
            return acc + F.coalesce(
                F.element_at(pmap, F.concat(bg["a"], bg["b"])), fallback
            )

    # char array AND bigram array hoisted to their own projections: the
    # embedded form re-split the full text per reference (size + aggregate
    # + 4 internal refs — see char_bigrams_from_chars); values identical
    bgs = F.col("_bg")
    return (
        docs.select(
            F.col(id_col),
            *[F.col(c) for c in extra_cols],
            F.split(F.col(text_col), "").alias("_cs"),
        )
        .select(
            F.col(id_col),
            *[F.col(c) for c in extra_cols],
            char_bigrams_from_chars(F.col("_cs")).alias("_bg"),
        )
        .select(
            F.col(id_col),
            *[F.col(c) for c in extra_cols],
            F.size(bgs).cast("long").alias("n_bigrams"),
            F.aggregate(bgs, F.lit(0.0), step).alias("_s"),
        )
        .where(F.col("n_bigrams") > 0)
        .select(
            id_col,
            *extra_cols,
            "n_bigrams",
            F.round(F.exp(-F.col("_s") / F.col("n_bigrams")), 4).alias("ppl"),
        )
    )
