"""Package the engine for spark-submit --py-files (pure-Python deploy,
no JVM extensions — SURVEY.md §4 'no custom Catalyst rules')."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "dist", "jsonschema_rs_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pkg = os.path.join(REPO, "jsonschema_rs_spark")
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(OUT)


if __name__ == "__main__":
    main()
