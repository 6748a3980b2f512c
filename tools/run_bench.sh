#!/bin/bash
# Run graft.Bench directly (no sbt) — mirrors build.sbt javaOptions.
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"; done
# forward args: query names select the BENCH.md isolated-run protocol
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-16g} -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench "$@"
