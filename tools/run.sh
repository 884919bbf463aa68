#!/bin/bash
# Helper: package once, then run graft mains with plain java (fast iteration;
# avoids sbt JVM startup per run).
set -e
cd /root/repo
JAR=target/scala-2.13/realtimefinanciallakehousespark_2.13-0.1.0.jar
CP="$JAR:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java $OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CP"
case "$1" in
  verify)  shift; SF="${1:-/root/testdata/sf0.001}"; OUT="${2:-/tmp/verify_out}"; shift 2 2>/dev/null || shift $#; exec $JAVA graft.Verify "$SF" "$OUT" "$@" ;;
  bench)   shift; SF="${1:-/root/testdata/sf0.01}"; shift 2>/dev/null || true; SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" exec $JAVA graft.Bench "$@" ;;
  main)    shift; exec $JAVA "$@" ;;
  *) echo "usage: run.sh {verify [sfDir] [outDir] | bench [sfDir] | main <class> [args]}"; exit 2 ;;
esac
