"""Build the --py-files zip for cluster submission.

Usage:
    python tools/package_pyfiles.py [out.zip]
    spark-submit --py-files sdv.zip \
        -m spanner_data_validator_spark.jobs.validate_transcripts ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str = "sdv.zip") -> str:
    pkg = os.path.join(REPO, "spanner_data_validator_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else "sdv.zip")
    print(path)
