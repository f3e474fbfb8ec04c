"""Package the engine for spark-submit --py-files (north rule shipping
requirement).

Builds dist/ocr_dataset_builder_spark.zip containing the package, then a
cluster run is:

    spark-submit \
      --py-files dist/ocr_dataset_builder_spark.zip \
      scripts/submit_extract.py \
      --input <nested documents table/path> --output <output dir>
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "ocr_dataset_builder_spark"


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for fn in files:
                if fn.endswith(".pyc") or "__pycache__" in root:
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
