#!/bin/bash
# Launch graft.Bench against a testdata dir from a (snapshot of the)
# compiled classes, with the JDK17 --add-opens set Spark needs.
#
#   tools/bench.sh SF_DIR [REPS] [CLASSES_DIR] [ONLY]
#
# CLASSES_DIR defaults to target/scala-2.13/classes; pass a snapshot copy
# to keep a long bench isolated from concurrent sbt compiles.
# ONLY is a comma-separated query filter (SPARK_GRAFT_BENCH_ONLY).
set -euo pipefail
SF_DIR=${1:?usage: bench.sh SF_DIR [REPS] [CLASSES_DIR] [ONLY]}
REPS=${2:-3}
CLASSES=${3:-target/scala-2.13/classes}
ONLY=${4:-}
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED \
--add-opens java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens java.base/java.io=ALL-UNNAMED \
--add-opens java.base/java.net=ALL-UNNAMED \
--add-opens java.base/java.nio=ALL-UNNAMED \
--add-opens java.base/java.util=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens java.base/sun.security.action=ALL-UNNAMED \
--add-opens java.base/sun.util.calendar=ALL-UNNAMED"
ENV=(SPARK_GRAFT_BENCH_REPS="$REPS" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$SF_DIR")
if [ -n "$ONLY" ]; then ENV+=(SPARK_GRAFT_BENCH_ONLY="$ONLY"); fi
SCALA_JARS=$( (ls /root/.sbt/boot/scala-2.13.*/lib/scala-library.jar 2>/dev/null || true) | head -1)
if [ -z "$SCALA_JARS" ]; then
  SCALA_JARS=$( (find /root/.cache/coursier -name 'scala-library-2.13*.jar' 2>/dev/null || true) | head -1)
fi
[ -n "$SCALA_JARS" ] || { echo "scala-library jar not found" >&2; exit 1; }
exec env "${ENV[@]}" java $OPENS -Xmx64g ${GRAFT_EXTRA_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*:$SCALA_JARS" graft.Bench
