ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gcpdatapipelinefypspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output passes through RAW (no "[info] " logger prefix): the
// bench driver tail-parses the run log for Bench's one-line JSON, and the
// prefixed copy fails its parse (rounds 1-3 all came back "parsed": null).
Compile / run / outputStrategy := Some(sbt.OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // pin the heap: G1 uncommits regions after every full GC (the bench runs
  // one between reps), then regrows the heap 2->6+ GB under the next rep's
  // allocation burst. This VM's memory is lazily backed at ~40 MB/s
  // first-touch (measured: AlwaysPreTouch of 24 GB took 9.5 min), so every
  // regrowth re-paid page faults as 1-5 s YOUNG pauses — 112 s of young GC
  // in one 4-rep sf1 run, and the source of every "random 20-150 s stall"
  // this bench has ever shown. Equal -Xms stops the uncommit, so pages
  // fault in exactly once per JVM. (AlwaysPreTouch would front-load that
  // 10-minute cost at startup — deliberately NOT used here.)
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // gc visibility: multi-second STW pauses show up as uniform slowdowns
  // across every running task and are invisible without this
  "-Xlog:gc,gc+heap=info:file=target/gc.log:time,uptime:filecount=2,filesize=10m",
)
