"""WARC ingestion (SURVEY §2.1 S1/S2).

The reference iterates WARC records single-threaded, keeps ``response``
records, UTF-8-decodes the payload with replacement, attaches the
``WARC-Target-URI``, and language-filters for zh
(reference ``CommonCrawl/warc_decoder.py:13-37``).

Spark shape: ``spark.read.format("binaryFile")`` over the WARC glob (one
task per file — WARCs are not splittable without an index) → ``mapInPandas``
decoding each file's records with ``warcio`` into the canonical web_pages
schema ``(url, warc_ts, html, text, lang)``. ``warcio`` is not installed in
this container, so the decode is import-gated; the record→row mapping
(``record_to_row``) is pure and unit-testable without it.
"""

from __future__ import annotations

import io
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.text import decode_payload, detect_language, extract_text
from .corpus import DOCS_SCHEMA

try:  # pragma: no cover - optional dependency
    from warcio.archiveiterator import ArchiveIterator  # type: ignore
except ImportError:
    ArchiveIterator = None


def record_to_row(url: str, warc_date: str | None, payload: bytes) -> dict:
    """One WARC response record → web_pages row. Decode semantics are the
    reference's exactly (UTF-8, errors=replace — ``warc_decoder.py:20-22``);
    ``text`` is the pinned extraction of the payload; ``lang`` from the
    heuristic detector (stands in for langdetect)."""
    decoded = decode_payload(payload)
    text = extract_text(payload)
    ts = None
    if warc_date:
        try:
            ts = datetime.fromisoformat(warc_date.replace("Z", "+00:00")).replace(tzinfo=None)
        except ValueError:
            ts = None
    return {
        "url": url,
        "warc_ts": ts,
        "html": payload,
        "text": text,
        "lang": detect_language(text or decoded),
    }


def _iter_warc_rows(content: bytes) -> Iterator[dict]:
    if ArchiveIterator is None:
        raise ImportError(
            "warcio is required for WARC decoding; install it on the cluster "
            "(the synthetic corpus generator covers the sandbox)"
        )
    for record in ArchiveIterator(io.BytesIO(content)):
        if record.rec_type != "response":  # reference warc_decoder.py:18
            continue
        payload = record.content_stream().read()
        url = record.rec_headers.get_header("WARC-Target-URI")
        date = record.rec_headers.get_header("WARC-Date")
        yield record_to_row(url, date, payload)


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC files → web_pages DataFrame (url, warc_ts, html, text, lang)."""
    files = spark.read.format("binaryFile").load(path_glob).select("content")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [row for content in pdf["content"] for row in _iter_warc_rows(content)]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return files.mapInPandas(decode, schema=DOCS_SCHEMA)
