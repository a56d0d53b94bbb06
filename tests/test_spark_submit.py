"""spark-submit --py-files deployment e2e (the north rule's shipping
story): the pipeline must run from ONLY the built zip — no repo on any
python path — exactly as `spark-submit --py-files dist/deepie_spark.zip
scripts/run_pipeline.py ...` would on a cluster, and resume
idempotently on a second submit.

Run at two parallelism levels (local[2], then local[4] for the resume)
— the sandbox stand-in for submitting at two cluster sizes.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_zip(tmp_path: Path) -> Path:
    sys.path.insert(0, str(REPO))
    from deepie_spark.session import build_pyfiles_zip

    return Path(build_pyfiles_zip(str(tmp_path / "deepie_spark.zip")))


def _submit(master: str, zip_path: Path, lake: Path, run_id: str,
            cwd: Path, resume: bool = False) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        SPARK_SUBMIT,
        "--master", master,
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(zip_path),
        str(REPO / "scripts" / "run_pipeline.py"),
        "--pages", "synth:60",
        "--lake", str(lake),
        "--run-id", run_id,
    ]
    if resume:
        cmd.append("--resume")
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, cwd=str(cwd),
        env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.skipif(
    not Path(SPARK_SUBMIT).exists(), reason="spark-submit not on this host"
)
def test_spark_submit_pyfiles_two_sizes_and_resume(tmp_path):
    zip_path = _build_zip(tmp_path)
    with zipfile.ZipFile(zip_path) as zf:  # the zip really carries the pkg
        assert "deepie_spark/plans/pipeline.py" in zf.namelist()

    lake = tmp_path / "lake"
    workdir = tmp_path / "elsewhere"  # NOT the repo: only the zip ships code
    workdir.mkdir()

    s1 = _submit("local[2]", zip_path, lake, "crawl-1", cwd=workdir)
    assert s1["kg_triples"] > 0 and s1["kg_entities"] > 0
    assert "triples" in s1["stages_run"]

    # second submit at a different size, same lake + run id: idempotent
    # resume skips every committed stage, output unchanged
    s2 = _submit(
        "local[4]", zip_path, lake, "crawl-1", cwd=workdir, resume=True
    )
    assert s2["kg_triples"] == s1["kg_triples"]
    assert s2["kg_entities"] == s1["kg_entities"]
    assert "triples" in s2["stages_skipped"]
