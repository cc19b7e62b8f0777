"""WARC record→row mapping (pure part; warcio itself is import-gated)."""

import pytest

from research_on_document_level_person_relation_extraction_in_chinese_spark.sources.warc import (
    ArchiveIterator,
    record_to_row,
)


def test_record_to_row_decode_semantics():
    html = "<html><body><p>陳大文與王小華是多年好友。</p></body></html>".encode()
    row = record_to_row("https://example.test/a", "2023-11-28T12:00:00Z", html)
    assert row["url"] == "https://example.test/a"
    assert row["warc_ts"].year == 2023 and row["warc_ts"].hour == 12
    assert row["html"] == html
    assert row["text"] == "陳大文與王小華是多年好友。"
    assert row["lang"] == "zh"


def test_record_to_row_replacement_decode():
    # invalid UTF-8 must decode with U+FFFD, never raise (warc_decoder.py:22)
    payload = b"<html><body><p>ok\xff\xfe</p></body></html>"
    row = record_to_row("u", None, payload)
    assert "�" in row["text"]
    assert row["warc_ts"] is None


def test_warcio_gate():
    assert ArchiveIterator is None  # not installed in this container
