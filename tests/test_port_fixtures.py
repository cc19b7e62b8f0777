"""Staleness guard for the committed plain-Python KG fixtures.

The parquet under fixtures/port/ is the DuckDB oracle for the 7 pipeline
queries (kg_triples, replays, linking/nodes/edges, PageRank). Any change to
the scorers / corpus templates / parse kernels / expansion or linking rules
shifts the expected sets — this test regenerates them in-process and compares
row-for-row, failing until ``scripts/gen_port_fixtures.py`` is re-run and the
refreshed fixtures are committed (CLAUDE.md co-design rule, 5th artifact)."""

import math
import os

import duckdb
import pytest

from research_on_document_level_person_relation_extraction_in_chinese_spark.plans.port_fixtures import (
    FIXTURE_COLUMNS,
    default_fixture_dir,
    port_kg_outputs,
)


@pytest.fixture(scope="module")
def outputs():
    return port_kg_outputs()


def _canon(rows):
    out = []
    for r in rows:
        out.append(
            tuple(round(v, 9) if isinstance(v, float) else v for v in r)
        )
    return sorted(out)


@pytest.mark.parametrize("name", sorted(FIXTURE_COLUMNS))
def test_fixture_current(outputs, name):
    path = os.path.join(default_fixture_dir(), f"{name}.parquet")
    assert os.path.exists(path), f"missing fixture {path} — run scripts/gen_port_fixtures.py"
    con = duckdb.connect()
    cols = ", ".join(FIXTURE_COLUMNS[name])
    rows = con.sql(f"SELECT {cols} FROM '{path}'").fetchall()
    con.close()
    got, want = _canon(rows), _canon(outputs[name])
    assert len(got) == len(want), (
        f"{name}: fixture has {len(got)} rows, code produces {len(want)} — "
        "run scripts/gen_port_fixtures.py and commit"
    )
    assert got == want, (
        f"{name}: stale fixture — run scripts/gen_port_fixtures.py and commit; "
        f"first diffs {[x for x, y in zip(got, want) if x != y][:3]}"
    )


def test_outputs_nontrivial(outputs):
    # the fixtures must keep exercising the interesting paths: alias-merged
    # nodes, multi-doc edges, non-uniform pagerank
    assert len(outputs["kg_triples"]) > 300
    assert any(n_aliases > 1 for _, n_aliases, _ in outputs["kg_nodes_pipeline"])
    assert any(n_docs > 1 for *_ignore, n_docs in outputs["kg_edges_pipeline"])
    ranks = [r for _, r in outputs["kg_pagerank"]]
    assert max(ranks) > min(ranks)
    assert math.isclose(sum(ranks), 1.0, abs_tol=1e-3)
