#!/bin/sh
# Launch the engine the way the north_star prescribes:
# spark-submit --py-files on a (local-mode stand-in for a) multi-executor cluster.
set -e
cd "$(dirname "$0")/.."
python tools/make_pyfiles.py
SPARK_BIN="${SPARK_HOME:-/opt/spark}/bin/spark-submit"
exec "$SPARK_BIN" --master "${MASTER:-local[8]}" \
  --py-files /tmp/ssc_pyfiles/sitemap_scan_spark.zip,/tmp/ssc_pyfiles/sim.zip \
  tools/submit_demo.py
