ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gosimpleembeddingdatabasespark"
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
  // local[32] with cached blocks + 48 sequential queries needs headroom:
  // at 8g the tail of the bench run is GC-bound (queries measured 3-8×
  // slower than in isolation); the box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // THE STALL FIX (r18, PLANS round-18): pin the heap committed. The
  // suite's bimodal cpu regime — one repeat of a fixed plan burning 4-7×
  // thread-cpu in allocation-heavy compiled frames, ~40% incidence on
  // the xm→successor pair at 32 threads — was G1 UNCOMMITTING regions
  // after the window-boundary System.gc(), with the successor window
  // re-faulting + zeroing tens of GB inside its own task threads
  // (thread-cpu includes kernel time). Xms = Xmx forbids the uncommit;
  // AlwaysPreTouch pays the first-touch cost once at JVM start. A/B:
  // 0/10 stalls with these flags vs 6/13 default (same pair, same box).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  "-XX:+AlwaysPreTouch",
  // JIT code-cache headroom for the 160-query bench suite's generated
  // classes in one JVM. Round-13 measurement (full suite, committed r12
  // code, -XX:+PrintCodeCache at exit): 136 MB used of the JDK 17 default
  // 240 MB, zero "CodeCache is full" warnings — NOT exhausted, so this is
  // prophylaxis against the suite's ~20-queries/round growth, not the fix
  // for the r12 curate_approx drift (which did not reproduce at suite
  // position: 3.86 s median; see PLANS.md round-13 adjudication).
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // mitigation A/B hook (round-17 stall forensics): extra JVM flags for
  // forked runs without editing the build, e.g.
  // SPARK_GRAFT_EXTRA_JVM="-XX:-UseCodeCacheFlushing"
  sys.env.get("SPARK_GRAFT_EXTRA_JVM").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
