from .corpus import generate_corpus, golden_triples, write_corpus

__all__ = ["generate_corpus", "golden_triples", "write_corpus"]
