#!/bin/bash
# Dev runner: launch a graft main on the compiled classes without sbt
# (same JVM flags as build.sbt's forked run). Usage:
#   tools/jrun.sh graft.TimeQuery /root/testdata/sf0.1 name1,name2 [passes]
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar"
FLAGS=""
for p in $OPENS; do FLAGS="$FLAGS --add-opens $p=ALL-UNNAMED"; done
exec java $FLAGS -Xmx${SPARK_DRIVER_MEM:-48g} -XX:+ExplicitGCInvokesConcurrent \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
