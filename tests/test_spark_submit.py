"""spark-submit --py-files launch path (the production deployment shape).

The cluster contract is: ship the package as a zip via ``--py-files``, point
spark-submit at the job script, pass data dirs as CLI args. This test runs
that exact invocation end-to-end in a separate JVM (local[2] master) over a
generated dual-transcript corpus and asserts the classified output counts
match the generator's ground truth — proving the package imports cleanly from
the zip with no repo checkout on the "cluster" side.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import pytest
from pyspark.sql import functions as F

from spanner_data_validator_spark.datagen import TRANSCRIPT_SCHEMA
from spanner_data_validator_spark.datagen.transcripts import gen_transcript_pair

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "spanner_data_validator_spark")


def _zip_package(dest: str) -> str:
    zip_path = os.path.join(dest, "sdv.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zip_path


def _spark_submit() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    import shutil

    found = shutil.which("spark-submit")
    if not found:
        pytest.skip("no spark-submit on PATH")
    return found


def test_spark_submit_py_files_batch(spark, tmp_path):
    pair = gen_transcript_pair(n_convs=60, seed=17)
    src_dir, tgt_dir = str(tmp_path / "src"), str(tmp_path / "tgt")
    out = str(tmp_path / "out")
    spark.createDataFrame(pair.source, schema=TRANSCRIPT_SCHEMA) \
         .coalesce(2).write.parquet(src_dir)
    spark.createDataFrame(pair.target, schema=TRANSCRIPT_SCHEMA) \
         .coalesce(2).write.parquet(tgt_dir)

    zip_path = _zip_package(str(tmp_path))
    job = os.path.join(PKG, "jobs", "validate_transcripts.py")
    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    # the submitted process must resolve the package from the zip alone
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        [_spark_submit(), "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path, job,
         "--source", src_dir, "--target", tgt_dir,
         "--out", out, "--checkpoint", str(tmp_path / "ckpt"),
         "--mode", "batch"],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path))
    assert res.returncode == 0, res.stderr[-3000:]

    classified = spark.read.parquet(os.path.join(out, "classified"))
    counts = {r["status"]: r["n"] for r in classified.groupBy("status")
              .agg(F.count("*").alias("n")).collect()}
    assert counts == {k: v for k, v in pair.expected.items() if v}
