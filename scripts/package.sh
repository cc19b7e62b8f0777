#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north rule deployment path).
#   ./scripts/package.sh [out.zip]   then:
#   spark-submit --master <cluster> --py-files engine.zip scripts/run_pipeline.py --input <web_pages> --out <stage-root>
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-engine.zip}"
rm -f "$OUT"
zip -qr "$OUT" research_on_document_level_person_relation_extraction_in_chinese_spark -x '*__pycache__*'
echo "wrote $OUT"
