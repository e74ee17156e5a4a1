#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine_pyfiles.zip
python - <<'EOF'
import zipfile, pathlib
pkg = "efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_spark"
with zipfile.ZipFile("dist/engine_pyfiles.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(pathlib.Path(pkg).rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote dist/engine_pyfiles.zip")
EOF
