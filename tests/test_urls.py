"""URL canonicalization (functions/urls.py) edge cases: idempotence, port
stripping only for defaults, tracking-param and empty-param removal, query
sort, fragment drop, hosts with userinfo, and no-query/no-path urls."""

import pytest
from pyspark.sql import functions as F

from research_on_document_level_person_relation_extraction_in_chinese_spark.functions.urls import (
    canonicalize_url,
    url_host,
)

CASES = [
    # (input, canonical, host)
    (
        "HTTP://WWW.Ex.COM:80/a/b?utm_source=x&z=1&a=2#frag",
        "http://www.ex.com/a/b?a=2&z=1",
        "www.ex.com",
    ),
    ("https://Ex.com:443/", "https://ex.com/", "ex.com"),
    ("https://ex.com:8443/x", "https://ex.com:8443/x", "ex.com"),  # non-default port kept
    ("http://ex.com", "http://ex.com", "ex.com"),  # no path, no query
    ("http://ex.com/?gclid=1&fbclid=2&ref=3&utm_x=4", "http://ex.com/", "ex.com"),
    ("http://ex.com/p?b=2&&a=1&", "http://ex.com/p?a=1&b=2", "ex.com"),
    ("http://user:pw@ex.com/p", "http://user:pw@ex.com/p", "ex.com"),
    ("http://ex.com/p?q=a?b", "http://ex.com/p?q=a?b", "ex.com"),  # ? inside value
]


@pytest.mark.parametrize("raw,canon,host", CASES)
def test_cases(spark, raw, canon, host):
    row = (
        spark.createDataFrame([(raw,)], "u string")
        .select(canonicalize_url(F.col("u")).alias("c"), url_host(F.col("u")).alias("h"))
        .first()
    )
    assert row["c"] == canon
    assert row["h"] == host


def test_idempotent(spark):
    df = spark.createDataFrame([(r,) for r, _, _ in CASES], "u string")
    once = df.select(canonicalize_url(F.col("u")).alias("c"))
    twice = once.select(canonicalize_url(F.col("c")).alias("c2"), "c")
    assert all(r["c"] == r["c2"] for r in twice.collect())
