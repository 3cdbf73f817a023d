"""The north rule's deployment shape, tested for real: the maintenance pass
runs under ``spark-submit --py-files engine.zip`` from a foreign cwd (no
repo on sys.path except via the zip — catches packaging regressions the
in-process suite can't)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

from engine.format import Table
from engine.scan import scan
from engine.synth import generate_transcripts, inject_missing
from engine.write import append

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    return cand if os.path.exists(cand) else None


@pytest.mark.skipif(_spark_submit() is None, reason="no spark-submit binary")
def test_maintenance_via_spark_submit_pyfiles(spark, tmp_path):
    df, _ = inject_missing(generate_transcripts(spark, num_convs=50))
    t = Table.create(str(tmp_path / "tbl"))
    append(t, df, num_files=6, range_cols=["conv_id", "turn_idx"],
           sort_cols=["conv_id", "turn_idx"])

    zip_path = str(tmp_path / "engine.zip")
    subprocess.run([sys.executable,
                    os.path.join(REPO, "tools", "run_maintenance.py"),
                    "--make-pyfiles", zip_path], check=True)
    proc = subprocess.run(
        [_spark_submit(), "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "run_maintenance.py"),
         "--table", t.root, "--target-bytes", str(1 << 20),
         "--grace-seconds", "0", "--json"],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path))  # foreign cwd: engine must come from the zip
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["merge_s"] > 0
    assert out["metrics"]

    # the submitted pass really imputed: HEAD has no missing cells
    assert scan(spark, t).filter(
        "role is null or text is null").count() == 0
