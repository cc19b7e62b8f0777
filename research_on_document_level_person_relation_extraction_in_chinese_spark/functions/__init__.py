"""Pure-function kernel shared by the Spark pipeline and the parity oracle.

Every function here is deterministic, side-effect free, and operates on plain
Python / pandas values so it can run (a) inside vectorized pandas UDFs on
executors and (b) inside the plain-Python reference-parity harness.
"""

from .chinese import s2t, s2t_list
from .parse import (
    ERROR_SENTINEL_PARSE,
    ERROR_SENTINEL_VERIFY,
    RELATION_CLASSES,
    canonical_triple,
    check_detection_format,
    parse_five_class_answers,
    parse_ner_names,
    parse_triples,
    parse_verdicts,
)

__all__ = [
    "s2t",
    "s2t_list",
    "parse_triples",
    "canonical_triple",
    "check_detection_format",
    "parse_ner_names",
    "parse_verdicts",
    "parse_five_class_answers",
    "ERROR_SENTINEL_PARSE",
    "ERROR_SENTINEL_VERIFY",
    "RELATION_CLASSES",
]
