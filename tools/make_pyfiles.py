"""Package ionex_spark for spark-submit --py-files deployment.

Produces dist/ionex_spark.zip containing the pure-Python package (no
JVM extensions by design — SURVEY.md §7), importable by executors via
--py-files on any cluster.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "dist", "ionex_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "ionex_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(OUT)


if __name__ == "__main__":
    main()
