#!/usr/bin/env bash
# Package + submit the KG-construction job (north rule: spark-submit --py-files).
# Local smoke: scripts/submit.sh --local /tmp/fx_t1/transcripts /tmp/kg_submit_out
set -euo pipefail
cd "$(dirname "$0")/.."

TRANSCRIPTS=${2:-/tmp/fx_t1/transcripts}
OUT=${3:-/tmp/kg_submit_out}

rm -f /tmp/morra_spark.zip
zip -qr /tmp/morra_spark.zip morra_spark -x "*/__pycache__/*"

if [[ "${1:-}" == "--local" ]]; then
  MASTER="local[${SPARK_GRAFT_CPUS:-32}]"
  exec spark-submit \
    --master "$MASTER" \
    --py-files /tmp/morra_spark.zip \
    --files models/kg_model.pkl \
    --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    morra_spark/job.py --transcripts "$TRANSCRIPTS" --out "$OUT" \
    --model models/kg_model.pkl --master "$MASTER"
fi

# Cluster shape (documented; needs a real cluster + Iceberg runtime):
cat <<'EOF'
spark-submit \
  --master yarn --deploy-mode cluster \
  --py-files morra_spark.zip \
  --files models/kg_model.pkl \
  --num-executors <N> --executor-cores 4 --executor-memory 16g \
  --conf spark.sql.shuffle.partitions=<2-3x total cores> \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.8.0 \
  morra_spark/job.py --transcripts catalog.db.transcripts --out s3://.../kg \
  --model kg_model.pkl
EOF
