#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north_rule launch shape).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/h2d.zip
python - <<'EOF'
import pathlib, zipfile

root = pathlib.Path(".")
with zipfile.ZipFile("dist/h2d.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("html_to_document_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote dist/h2d.zip")
EOF
