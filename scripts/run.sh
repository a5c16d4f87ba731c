#!/bin/bash
# Launch a graft main class without sbt (avoids sbt lock + JVM startup).
# Usage: scripts/run.sh <MainClass> [args...]   (env: SPARK_DRIVER_MEM)
CLS="$1"; shift
exec java \
  $(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
             java.util java.util.concurrent java.util.concurrent.atomic; do \
      echo "--add-opens=java.base/$p=ALL-UNNAMED"; done) \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-24g} \
  ${GRAFT_GC_LOG:+-Xlog:gc:file=$GRAFT_GC_LOG} \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "graft.$CLS" "$@"
