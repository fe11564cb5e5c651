package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Ingest throughput: drive the full device state machine (decode →
    * validate → resolve → trigger match → effects) over the events
    * table and report events/second — the stream-processor headline
    * the reference is actually about.
    */
  /** Exposed for IngestBenchOnly (repeated-run profiling). */
  def ingestEpsPublic(spark: SparkSession, sfDir: String): Double = ingestEps(spark, sfDir)

  private def ingestEps(spark: SparkSession, sfDir: String): Double = {
    import spark.implicits._
    import graft.core._, graft.core.AstarteValueType._
    import graft.streaming._
    import graft.triggers._
    val ifaceName = "com.bench.EventStream"
    val registry = Registry(
      Map(ifaceName -> InterfaceDescriptor(ifaceName, 1, 0,
        InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)),
      Map(ifaceName -> Seq(Mapping(ifaceName, 1, "/%{type}/value", ADouble))),
      Seq(Trigger("t-gt", TriggerEventType.IncomingData,
        TriggerScope.OnInterface(ifaceName, 1), Some("/purchase/value"),
        MatchOperator.GreaterThan, 150.0, List("amqp://high-purchase"))))
    // Through Tables.events so ts arrives under the canonical
    // epoch-nanos-long contract regardless of the parquet's physical
    // timestamp encoding (see Tables.normalizeTs).
    val events = graft.queries.Tables.events(spark, sfDir)
    // Columnar envelope construction: the whole input adapter — device
    // id, path, BSON payload — is codegen'd column work that fuses
    // with the ingest precompute into one whole-stage span over the
    // scan (no row-at-a-time lambda on the hot path).
    import org.apache.spark.sql.functions._
    val envelopes = events.select(
      lit("bench").as("realm"),
      concat(lit("device-"), col("user_id")).as("deviceId"),
      lit("data").as("msgType"),
      lit(ifaceName).as("iface"),
      concat(lit("/"), col("event_type"), lit("/value")).as("path"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.BsonEncodeV(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("value"))))
        .as("payload"),
      expr("ts div 1000 * 10").as("receptionDecimicros"),
      lit("10.0.0.1").as("ipAddress"),
      col("event_id").as("offset")).as[Envelope]
    val n = events.count()
    // Plan once, execute repeatedly: a production ingest is a standing
    // stream whose plan + generated code are built once and run per
    // micro-batch forever — timing re-planning on every run would
    // measure the driver's analyzer, not the engine. The min over
    // executions of the ONE plan reflects that steady state (run 1
    // still pays codegen compilation + parquet first-touch).
    val fx = DeviceStateMachine.processBatch(envelopes, registry)
      .filter(_.kind == "datastream_append")
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      fx.count()
      (System.nanoTime() - t0) / 1e9
    }
    n / times.min
  }
  private def readLoadavg(): String = try {
    scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(",")
  } catch { case _: Throwable => "" }

  def main(args: Array[String]): Unit = {
    // wall-clock for the whole bench JVM: lets a loaded host be told
    // apart from a code regression when per-query numbers move
    val wallT0 = System.nanoTime()
    // loadavg BEFORE the suite: the bench's own 32 threads push the
    // end-of-run loadavg up, so only the start snapshot can prove the
    // host was idle when the run began
    val loadavgStart = readLoadavg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Per-file open cost for scan-split packing (guide §6). The 4 MB
    // default models remote-FS open/seek latency and collapses
    // Spark's split formula to one-task-per-file whenever
    // totalBytes/cores < 4 MB — on the store's many-small-file roots
    // that is ~200 ×60 KB single-file tasks per census scan, pure
    // scheduling overhead. Local page-cache opens cost ~none, so the
    // local default packs small files (64 KB ≈ honest open cost);
    // on a cluster against object storage export
    // SPARK_GRAFT_OPEN_COST_BYTES=4194304 to restore the remote-FS
    // model. Scan parallelism for real tables is untouched (split
    // size still follows bytes/cores).
    val openCost = sys.env.getOrElse("SPARK_GRAFT_OPEN_COST_BYTES", "65536")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.openCostInBytes", openCost)
      // Distributed partition-discovery kicks in above 32 root paths
      // (a pruned store read passes one path per live file),
      // launching a one-task-per-directory listing JOB before every
      // such scan — pure scheduling overhead against a local FS where
      // the driver lists thousands of dirs in microseconds. Against
      // slow object storage at 100 TB export a lower threshold (the
      // Spark default 32) so listing parallelizes.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_PAR_DISCOVERY_THRESHOLD", "4096"))
      .config("spark.sql.adaptive.enabled", "true")
      // Coalesce post-shuffle partitions to the ADVISORY SIZE instead
      // of pinning to the session core count (r17 opt round, guide
      // §2.2 "fewer, larger reduce partitions"): parallelismFirst=true
      // (the default) special-cases the LOCAL parallelism — every tiny
      // exchange stays at `cpus` partitions and pays `cpus` fixed task
      // costs; false is the setting Spark's own tuning docs recommend
      // once partitions are sized in bytes, and it is scale-adaptive
      // by construction (64 MB advisory chunks at 100 TB, one task for
      // a kB-sized exchange). Quiet A/B over a 58-query mixed subset:
      // total min 14.34 -> 13.29 s, median per-query ratio 0.90, no
      // reproducible regression (worst +0.07 s, load-level).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
      // let AQE re-coalesce CACHED plan output: the dedup pipeline
      // caches its 260k-row shingle/band tables, and without this the
      // cache pins scan-sized shuffle partitioning on every consumer
      // (the clusterers' dominant overhead at sf0.1 — 2.1s -> 0.5s on
      // the Jaccard-verify stage alone)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // UNTIMED warm-up pass over EVERY query — not just one: several
    // packs lazily build on-disk store roots (file index, sketch log,
    // lex index, band store) on first touch, and charging that build
    // to whichever query runs first made identical-code totals swing
    // 20%+ between rounds. The warm-up also pays codegen compilation
    // and parquet footer first-touch, so the timed region measures
    // steady-state latency only.
    // Optional comma-separated name-prefix filter for micro-bench
    // iteration (e.g. SPARK_GRAFT_BENCH_PREFIXES=dd_incremental,fx_).
    // Unset (the driver's case) = the full suite, unchanged.
    val prefixes = sys.env.get("SPARK_GRAFT_BENCH_PREFIXES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      prefixes.forall(_.exists(n.startsWith))
    }
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // CONSECUTIVE timed runs per query, first run discarded. Two
    // sampling designs were A/B-measured on one idle host, same code:
    // round-robin interleaving (each query's samples spread minutes
    // apart, the obvious fix for correlated GC bursts) read 121/140 s
    // totals with only 67% pair agreement on the min estimator,
    // because revisiting a query after ~200 others evicts its working
    // set — every sample pays cold-cache costs and those costs are
    // the noise; consecutive sampling on the same host read 83 s with
    // the historical agreement. Measured, then designed out:
    // consecutive stays. The remaining tail (sub-second queries whose
    // FIRST consecutive sample absorbs the PREVIOUS query's cache/GC
    // wake) is cut by timing six runs and discarding the first, so
    // the estimators see only samples taken inside the query's own
    // steady state. MEDIAN of the kept five = the reported number
    // (rejects up to two hiccups); MIN rides along as `queries_min`
    // (the floor estimate — compare with tools/bench_compare.py
    // --key). Per-query 1-min loadavg makes a loaded entry
    // attributable, not just a loaded run.
    val loadavgOf = () => readLoadavg().split(",").headOption.getOrElse("")
    val results = selected.map { case (name, fn) =>
      val load = loadavgOf()
      val times = (1 to 6).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 } // failures must be visible
      }.drop(1)
      val (t, tMin) =
        if (times.contains(-1.0)) (-1.0, -1.0)
        else (times.sorted.apply(2), times.min)
      (name, t, tMin, load)
    }
    // millisecond precision: sub-ms digits are noise and the shorter
    // line survives log-tail truncation in downstream artifact capture
    def fmt(sel: ((String, Double, Double, String)) => Double) =
      results.map { t =>
        val v = sel(t)
        s"\"" + t._1 + "\":" + (if (v < 0) v else math.round(v * 1000) / 1000.0)
      }.mkString("{", ",", "}")
    val qs = fmt(_._2)
    val qmin = fmt(_._3)
    val qload = results.map { t =>
      s"\"" + t._1 + "\":\"" + t._4 + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val eps =
      if (prefixes.isDefined) -1L // filtered micro-bench: skip ingest
      else try math.round(ingestEps(spark, sfDir)) catch { case _: Throwable => -1L }
    val wall = (System.nanoTime() - wallT0) / 1e9
    // host-load snapshots: wall_sec alone can't tell a loaded box
    // from a code regression — record 1/5/15-min loadavg at both ends
    // (start = was the host idle; end = what the suite itself did)
    val loadavg = readLoadavg()
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ingest_events_per_sec":$eps,"wall_sec":$wall,"loadavg":"$loadavg","loadavg_start":"$loadavgStart","queries_min":$qmin,"loadavg_per_query":$qload,"sf":"$sfDir"}"""
    println(json)
    // durable copy with every entry, immune to stdout-tail truncation.
    // Lands in the working directory (or SPARK_GRAFT_BENCH_OUT) so a
    // checkout elsewhere never clobbers an unrelated absolute path;
    // a failed write warns instead of vanishing.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LATEST.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath).toAbsolutePath, json + "\n")
    catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not write $outPath: $e")
    }
    spark.stop()
  }
}
