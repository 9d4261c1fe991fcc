#!/usr/bin/env bash
# Package the library for spark-submit --py-files (north rule).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/generative_ner_spark.zip
python - <<'PY'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/generative_ner_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("generative_ner_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote dist/generative_ner_spark.zip")
PY
