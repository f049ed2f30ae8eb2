"""Build dist/openfactverification_spark.zip for spark-submit --py-files.

Ships .py AND .json: the parser rule-packs (rulepacks/*.json) are package data
the pipeline loads at import time — a zip without them breaks every executor.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "openfactverification_spark"


# Fixed timestamp so the build is deterministic: same sources -> byte-identical
# zip, regardless of checkout mtimes (keeps dist/ stable across test runs).
_EPOCH = (1980, 1, 1, 0, 0, 0)


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs.sort()
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith((".py", ".json")):
                    full = os.path.join(root, f)
                    info = zipfile.ZipInfo(
                        os.path.relpath(full, REPO), date_time=_EPOCH
                    )
                    info.compress_type = zipfile.ZIP_DEFLATED
                    info.external_attr = 0o644 << 16
                    with open(full, "rb") as fh:
                        zf.writestr(info, fh.read())
    print(out)
    return out


if __name__ == "__main__":
    main()
