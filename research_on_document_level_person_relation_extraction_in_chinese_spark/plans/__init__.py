from .pipeline import extract_triples, run_pipeline

__all__ = ["extract_triples", "run_pipeline"]
