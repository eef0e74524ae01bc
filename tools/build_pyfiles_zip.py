"""Build the ``--py-files`` zip for cluster submission.

``spark-submit --py-files dist/ag_engine_pyfiles.zip`` ships the
engine package to every executor's Python worker — the same mechanism
``__spark_entry__._ship_package`` uses at runtime via ``addPyFile``
(the two paths are kept identical so local[32] testing exercises the
real deployment path). Usage:

    python tools/build_pyfiles_zip.py [out.zip]

then, on a cluster:

    spark-submit --master yarn --deploy-mode cluster \\
        --py-files dist/ag_engine_pyfiles.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.shuffle.partitions=2000 \\
        your_job.py

See README "Deployment" for the full runbook.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "ag_data_ingestion_github_to_snowflake_spark"


def build(out: Path) -> Path:
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", compression=zipfile.ZIP_DEFLATED) as z:
        for p in sorted(PKG.rglob("*.py")):
            z.write(p, arcname=str(p.relative_to(PKG.parent)))
    return out


if __name__ == "__main__":
    dest = Path(sys.argv[1]) if len(sys.argv) > 1 else ROOT / "dist" / "ag_engine_pyfiles.zip"
    print(build(dest))
