package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** True cross-PROCESS file-index soak: two forked child JVMs
  * ([[FileIndexSoakChild]]) and this (parent) JVM absorb disjoint
  * increments into ONE index root concurrently. The documented
  * contract says concurrent ABSORBS are safe (only maintenance needs
  * the ProcessLock): each absorb writes its own generation directory
  * and appends to the shared zone/bloom/manifest logs through the
  * store's unique-tmp-then-rename protocol, so writers never touch
  * each other's files. Pass = every absorbed row readable through the
  * index exactly once, every generation live, per-generation zone
  * census exact. (Version-boundary ambiguity under racing publishes
  * is the documented time-travel caveat — head reads must be exact.)
  */
class TwoJvmFileIndexSoakSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def launchChild(root: String, writer: String, nAbs: Int,
      rowsPer: Int, base: Long, logDir: String): Process = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx1g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.queries.FileIndexSoakChild",
      root, writer, nAbs.toString, rowsPer.toString, base.toString))
    new ProcessBuilder(cmd: _*)
      .redirectOutput(new java.io.File(s"$logDir/$writer.out"))
      .redirectErrorStream(true)
      .start()
  }

  test("two child JVMs + the parent absorb concurrently; head reads are exact") {
    import spark.implicits._
    def synth(ids: Range) = ids.map { i =>
      (i.toLong, (i % 2000).toLong * 1000000000L, (i % 50).toLong,
        "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val logDir = Files.createTempDirectory("graft-fx2jvm").toString
    val root = ScanPruning.FileIndexStore.buildRootFrom(
      spark, synth(0 until 500))
    val nAbs = 3; val rowsPer = 100

    // disjoint id ranges: corpus 0-499, w1 10000+, w2 20000+, parent 30000+
    val c1 = launchChild(root, "w1", nAbs, rowsPer, 10000L, logDir)
    val c2 = launchChild(root, "w2", nAbs, rowsPer, 20000L, logDir)
    for (b <- 1 to nAbs) {
      val off = 30000 + (b - 1) * rowsPer
      assert(ScanPruning.FileIndexStore.absorb(spark, root,
        synth(off until off + rowsPer), s"w0-$b"))
    }
    assert(c1.waitFor() == 0, s"child w1 crashed — see $logDir/w1.out")
    assert(c2.waitFor() == 0, s"child w2 crashed — see $logDir/w2.out")

    // every generation live, ledger complete
    val gens = ScanPruning.FileIndexStore.liveGens(spark, root).toSet
    val wantGens = Set("corpus") ++
      (for (w <- Seq("w0", "w1", "w2"); b <- 1 to nAbs) yield s"$w-$b")
    assert(gens == wantGens, s"live generations diverged: $gens")

    // exactly-once head read: every id present once, none invented
    val pairs = ScanPruning.FileIndexStore.livePairs(spark, root)
    val all = spark.read.parquet(pairs.map { case (g, b) =>
      ScanPruning.FileIndexStore.bucketDir(root, g, b)
    }: _*)
    val wantIds = (0 until 500).map(_.toLong) ++
      (for (base <- Seq(10000, 20000, 30000); k <- 0 until nAbs * rowsPer)
        yield (base + k).toLong)
    val gotIds = all.select(col("event_id")).collect().map(_.getLong(0))
    assert(gotIds.length == wantIds.size,
      s"row count ${gotIds.length} != ${wantIds.size}")
    assert(gotIds.toSet == wantIds.toSet, "id set diverged")
    assert(gotIds.length == gotIds.distinct.length, "a row was doubled")

    // the zone census agrees with the data, per generation
    val census = ScanPruning.FileIndexStore.zone(spark, root)
      .groupBy(col("inc_id")).agg(sum(col("n")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census("corpus") == 500L)
    for (g <- wantGens - "corpus") assert(census(g) == rowsPer.toLong, g)

    // and the pruned point path still answers exactly
    val hits = spark.read.parquet(
      ScanPruning.pointSurvivors(spark, root, 7L)
        .select(col("inc_id"), col("zbucket")).collect().map(r =>
          ScanPruning.FileIndexStore.bucketDir(root, r.getString(0),
            r.getInt(1))).toIndexedSeq: _*)
      .filter(col("user_id") === 7L).count()
    assert(hits == all.filter(col("user_id") === 7L).count(),
      "pruned point read diverged from the full head read")
  }
}
