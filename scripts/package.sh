#!/usr/bin/env bash
# Build the spark-submit distribution: dist/qalsh_spark.zip (north-rule
# packaging: `spark-submit --py-files dist/qalsh_spark.zip jobs/dedup.py ...`).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
python - <<'EOF'
import os, zipfile

out = "dist/qalsh_spark.zip"
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("qalsh_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print(f"wrote {out} ({os.path.getsize(out)} bytes)")
EOF
