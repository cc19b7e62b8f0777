from .ingest import stream_extract_triples

__all__ = ["stream_extract_triples"]
