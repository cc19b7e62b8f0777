"""North-rule deployment path: the engine really runs via
``spark-submit --py-files engine.zip`` with NO repo directory on any path.

The driver script is copied into a scratch directory so its own
``sys.path.insert(repo_parent)`` points at the scratch dir — every
``research_on_document_level_person_relation_extraction_in_chinese_spark``
import must therefore resolve from the zip shipped via --py-files, exactly
as on a cluster where executors only receive the archive.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(tmp_path):
    zip_path = tmp_path / "engine.zip"
    subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "package.sh"), str(zip_path)],
        check=True,
        capture_output=True,
    )
    assert zip_path.stat().st_size > 10_000

    script = tmp_path / "run_pipeline.py"
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), script)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out_dir = tmp_path / "kg_run"
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", str(zip_path),
            str(script),
            "--docs", "80",
            "--out", str(out_dir),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    start = proc.stdout.index('{\n "n_triples"')
    summary = json.loads(proc.stdout[start:])
    assert summary["n_triples"] > 0
    assert summary["n_nodes"] > 0
    assert summary["lineage"].get("snapshot_id"), "lineage manifest chain missing"
    # checkpointed stages landed under --out
    assert (out_dir / "expanded.manifest.json").exists()
