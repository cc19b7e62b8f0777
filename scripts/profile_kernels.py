"""Profile the pure-Python scorer kernels that run inside the pipeline's
three pandas-UDF nodes (annotate/parse, consensus, expansion) — guide §1:
measure first. No Spark needed: make_doc is a pure function of (seed, id).

Usage: python scripts/profile_kernels.py [n_docs]
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, ".")

from research_on_document_level_person_relation_extraction_in_chinese_spark.functions.analysis import (  # noqa: E402
    expansion_pairs,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.functions.chinese import (  # noqa: E402
    s2t,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.functions.parse import (  # noqa: E402
    parse_verdicts,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.parse import (  # noqa: E402
    _parse_cell,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.scorers import (  # noqa: E402
    deterministic as det,
)
from research_on_document_level_person_relation_extraction_in_chinese_spark.sources.corpus import (  # noqa: E402
    make_doc,
)


def pipeline_one(text: str) -> int:
    """Replay the per-doc Python work of all three pipeline nodes."""
    n = 0
    # --- node 1: annotate + parse (2 annotators)
    parsed = {}
    for ann in ("gemini", "gpt"):
        status, output, _att = det.score_detect_with_attempts(text, ann)
        cell = _parse_cell(output, status, True)
        parsed[ann] = cell
    # --- node 2: trad + cross-compare + verify
    trad = {}
    for ann in ("gemini", "gpt"):
        tern = parsed[ann]["ternary"] or []
        out = []
        for t in tern:
            p1, p2, rel = s2t(t["subj"]), s2t(t["obj"]), s2t(t["rel"])
            lo, hi = sorted([p1, p2])
            tup = (lo, hi, rel)
            if tup not in out:
                out.append(tup)
        trad[ann] = out
    sets = {ann: set(v) for ann, v in trad.items()}
    merged = []
    for ann in ("gemini", "gpt"):
        mine = trad[ann]
        theirs = sets["gpt"] if ann == "gemini" else sets["gemini"]
        wrong = [x for x in mine if x not in theirs]
        correct = [x for x in mine if x in theirs]
        passed = []
        if wrong:
            answer = det.score_verify(text, wrong)
            verdicts = parse_verdicts(answer, len(wrong))
            if verdicts is not None:
                passed = [w for w, ok in zip(wrong, verdicts) if ok]
        merged.extend(correct + passed)
    n += len(merged)
    # --- node 3: expansion (only non-empty consensus docs)
    if merged:
        trad_text = s2t(text)
        already = {(a, b) for a, b, _ in trad[
            "gemini"] } | {(a, b) for a, b, _ in trad["gpt"]}
        ents = det.score_ner(trad_text)
        density, extra = expansion_pairs(ents, already, trad_text)
        if density == "middle" and extra:
            answer = det.score_expansion_pairs(trad_text, extra)
            n += len(answer)
    return n


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    docs = []
    for i in range(n_docs):
        row, _g = make_doc(i, 42)
        if row["lang"] == "zh":
            docs.append(row["text"])
    print(f"{len(docs)} zh docs of {n_docs}")

    t0 = time.perf_counter()
    for d in docs:
        pipeline_one(d)
    wall = time.perf_counter() - t0
    print(f"plain pass: {wall:.3f}s  ({len(docs)/wall:.0f} docs/s single-core)")

    pr = cProfile.Profile()
    pr.enable()
    for d in docs:
        pipeline_one(d)
    pr.disable()
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(35)
    print(s.getvalue())


if __name__ == "__main__":
    main()
