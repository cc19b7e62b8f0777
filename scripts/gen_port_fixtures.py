#!/usr/bin/env python3
"""Regenerate the committed plain-Python KG fixtures under fixtures/port/.

Run after ANY change to the scorers, corpus templates, parse kernels,
expansion rules, or linking semantics (the CLAUDE.md co-design rule):

    python scripts/gen_port_fixtures.py

then commit the refreshed parquet. tests/test_port_fixtures.py fails until
the fixtures match the code again.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from research_on_document_level_person_relation_extraction_in_chinese_spark.plans.port_fixtures import (  # noqa: E402
    default_fixture_dir,
    write_port_fixtures,
)


def main() -> None:
    out = default_fixture_dir()
    counts = write_port_fixtures(out)
    for name, n in sorted(counts.items()):
        print(f"{name}: {n} rows")
    print(f"wrote {len(counts)} fixtures to {out}")


if __name__ == "__main__":
    main()
