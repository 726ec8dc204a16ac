"""Package the engine for spark-submit: dist/table_ocr_spark.zip.

    python tools/make_pyfiles.py
    spark-submit --master <cluster> --py-files dist/table_ocr_spark.zip \
        jobs/extract.py --input ... --output ...

(SURVEY.md §3.4 launch shape; north rule: spark-submit --py-files.)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "table_ocr_spark.zip")
    pkg = os.path.join(REPO, "table_ocr_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    zf.write(p, os.path.relpath(p, REPO))
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
