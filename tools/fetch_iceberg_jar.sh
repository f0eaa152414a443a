#!/usr/bin/env bash
# Fetch the iceberg-spark-runtime jar matching the installed PySpark so
# tests/test_iceberg.py::test_iceberg_round_trip can execute.  This
# sandbox has no network (verified: DNS to repo1.maven.org fails), so
# the round-trip gate runs only in environments with outbound access —
# run this script there, then:
#   SPARK_GRAFT_ICEBERG_JAR=build/iceberg-spark-runtime.jar python -m pytest tests/test_iceberg.py
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p build
# PySpark 4.1.x = Spark 4.1 / Scala 2.13
VER="${ICEBERG_VERSION:-1.10.0}"
ART="iceberg-spark-runtime-4.1_2.13"
URL="https://repo1.maven.org/maven2/org/apache/iceberg/${ART}/${VER}/${ART}-${VER}.jar"
curl -fL -o "build/iceberg-spark-runtime.jar" "$URL"
echo "fetched $URL -> build/iceberg-spark-runtime.jar"
