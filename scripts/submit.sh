#!/usr/bin/env bash
# Package the engine and run the spatial pipeline via spark-submit
# --py-files (north_rule deployment shape). Against a real cluster, set
# MASTER=spark://... or yarn; everything else is identical.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${MASTER:-local[8]}"
SF="${SF:-0.001}"
OUT="${OUT:-$REPO/data/spatial_pipeline_out}"  # NOT /tmp: an external reaper wipes it mid-run

mkdir -p "$REPO/dist"
ZIP="$REPO/dist/dxf_postgis_converter_spark.zip"
rm -f "$ZIP"
(cd "$REPO" && python -c "
import zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('dxf_postgis_converter_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
")

exec spark-submit \
  --master "$MASTER" \
  --driver-memory "${DRIVER_MEMORY:-16g}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-32}" \
  --conf spark.sql.parquet.columnarReaderBatchSize="${READER_BATCH:-512}" \
  --py-files "$ZIP" \
  "$REPO/scripts/job_spatial_pipeline.py" --sf "$SF" --out "$OUT" "$@"
