#!/usr/bin/env python
"""Interleaved A/B of the minhash/jaccard bench queries across two repo tips.

Round-4 verdict watch item: BENCH_r04 showed minhash_lsh 4.17->5.51 s,
minhash_lsh_inverted 3.65->4.14 s, ngram_jaccard 2.60->2.99 s vs BENCH_r03 —
plausibly tenant noise, plausibly a real regression from the round-4 dedup
changes (one-slot managed persist pool interaction with the newly benched
paragraph_dedup/semdedup).

Method (same discipline as scripts/scaling_bench.py): check out the r3 tip
into a temporary git worktree, then run R interleaved repeats — r3 child,
current child, r3 child, ... — each in a FRESH subprocess (own JVM), each
child warming up and taking best-of-2 per query with cache clears between
runs. Interleaving means tenant load hits both tips symmetrically; best-of-R
bounds burst influence. Verdict rule: ratio (current/r3) within ~1.1 on the
best-of numbers = noise attribution; >1.25 = real regression to chase.

Usage: python scripts/minhash_ab.py [r3_commit] (default: the r3 tip
debb032, the last code commit measured by BENCH_r03). Writes one JSON line
to stdout; tee into BENCH/ for the record.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

QUERIES = ["minhash_lsh", "minhash_lsh_inverted", "ngram_jaccard", "ngram_jaccard_prefix"]
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD_SRC = r"""
import json, sys, time
repo, sfdir, cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])
names = json.loads(sys.argv[4])
sys.path.insert(0, repo)
import __spark_entry__ as E
from research_on_document_level_person_relation_extraction_in_chinese_spark import get_spark
from bench import _warmup, _noop_run
spark = get_spark("minhash-ab", cores=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
_warmup(spark, cpus)
qs = E.queries()
out = {}
for name in names:
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _noop_run(qs[name](spark, sfdir))
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
    time.sleep(min(2 + best / 4, 6))
print("ABRESULT:" + json.dumps(out))
spark.stop()
"""


def run_child(tip_dir: str, sf_dir: str, cpus: int) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", CHILD_SRC, tip_dir, sf_dir, str(cpus), json.dumps(QUERIES)],
        capture_output=True,
        text=True,
        cwd=tip_dir,
        check=False,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"child failed: {proc.stderr[-2000:]}")
    line = [l for l in proc.stdout.splitlines() if l.startswith("ABRESULT:")][-1]
    return json.loads(line[len("ABRESULT:"):])


def main() -> None:
    r3_commit = sys.argv[1] if len(sys.argv) > 1 else "debb032"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("AB_REPEATS", "3"))

    wt = tempfile.mkdtemp(prefix="minhash_ab_r3_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, r3_commit],
        cwd=REPO, check=True, capture_output=True,
    )
    runs: dict[str, list[dict]] = {"r3": [], "cur": []}
    try:
        for _ in range(repeats):
            runs["r3"].append(run_child(wt, sf_dir, cpus))
            runs["cur"].append(run_child(REPO, sf_dir, cpus))
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, check=False, capture_output=True,
        )
        shutil.rmtree(wt, ignore_errors=True)

    result: dict = {"r3_commit": r3_commit, "sf_dir": sf_dir, "cpus": cpus, "runs": runs}
    for q in QUERIES:
        b3 = min(r[q] for r in runs["r3"])
        bc = min(r[q] for r in runs["cur"])
        result[q] = {"r3_best": b3, "cur_best": bc, "ratio": round(bc / b3, 3)}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
