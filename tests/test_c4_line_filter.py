"""c4_line_filter (operators/textstats.py): C4-style line gate (terminal
punctuation + min words) and page gate (min surviving lines, lorem ipsum,
curly brace), text rebuilt from kept lines; map-only, shuffle-free plan."""

from research_on_document_level_person_relation_extraction_in_chinese_spark.operators.textstats import (
    c4_line_filter,
)

GOOD = "this is a perfectly fine sentence."  # 6 words, terminal '.'


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return {
        r.doc_id: (r.text, r.n_lines_kept, r.n_lines_orig)
        for r in c4_line_filter(df, **kw).collect()
    }


def test_line_gates(spark):
    text = "\n".join(
        [
            GOOD,
            "no terminal punctuation here",  # dropped: no terminal
            "too short.",  # dropped: < 5 words
            "does this question count as a line?",  # kept: '?' terminal
            'he said "stop right there"',  # dropped: no terminal after quote? ends with '"' → kept
        ]
    )
    got = _run(spark, [(1, text)], min_words=5, min_lines=1)
    kept_text, n_kept, n_orig = got[1]
    assert n_orig == 5
    assert kept_text.splitlines() == [
        GOOD,
        "does this question count as a line?",
        'he said "stop right there"',
    ]
    assert n_kept == 3


def test_page_gates(spark):
    got = _run(
        spark,
        [
            (1, "\n".join([GOOD] * 3)),  # passes
            (2, "\n".join([GOOD] * 2)),  # too few kept lines
            (3, "\n".join([GOOD] * 3) + "\nsome Lorem Ipsum boilerplate."),
            (4, "\n".join([GOOD] * 3) + "\nif (x) { y(); }"),
        ],
        min_words=5,
        min_lines=3,
    )
    assert set(got) == {1}
    assert got[1] == ("\n".join([GOOD] * 3), 3, 3)


def test_cjk_terminals(spark):
    got = _run(
        spark,
        [(1, "甲 乙 丙 丁 戊 己。\n甲 乙 丙 丁 戊 己")],
        min_words=5,
        min_lines=1,
    )
    assert got[1][1] == 1  # only the 。-terminated line survives


def test_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id int, text string")
    plan = (
        c4_line_filter(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
