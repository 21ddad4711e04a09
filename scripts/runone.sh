#!/bin/bash
# Direct-JVM RunOne (no sbt lock contention): scripts/runone.sh <query> <sfDir> <reps> [explain]
# Mirrors build.sbt's forked-run JVM options (JDK-17 add-opens + heap).
set -e
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*:$HOME/.sbt/boot/scala-2.13.17/lib/scala-library.jar"
# scala-library ships in /opt/spark/jars too; the boot copy is a fallback
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-48g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.RunOne "$@"
