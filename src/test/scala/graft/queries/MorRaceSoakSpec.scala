package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Concurrency soak for the merge-on-read erase ↔ rewrite race
  * guards: the staged-interleaving spec (ScanPruningSpec) proves each
  * conflict fires at the exact window; this soak proves the
  * OPTIMISTIC RETRY LOOPS converge under genuine concurrent pressure
  * — erases landing mid-compaction and compactions retiring files
  * mid-erase, repeatedly, on one shared session (the two-JVM soak
  * covers cross-process absorb-vs-compact; this one targets the
  * round-17 preconditions specifically).
  *
  * Invariant under ANY interleaving: an eraseDv that RETURNED TRUE is
  * never lost — the user's rows are absent from every subsequent
  * read, whatever maintenance ran concurrently. Conflicts are
  * expected traffic here (that is the design), so the erase thread
  * retries CommitConflict like a production caller would.
  */
class MorRaceSoakSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  test("concurrent eraseDv and compaction never lose a confirmed erasure") {
    import spark.implicits._
    val fis = ScanPruning.FileIndexStore
    val synth = (0 until 1200).map { i =>
      (i.toLong, i.toLong * 1000000000L, (i % 40).toLong, "view",
        (i % 97 + 1) / 100.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val root = fis.buildRootFrom(spark, synth)
    assert(fis.absorb(spark, root,
      synth.withColumn("event_id", col("event_id") + 100000L), "inc-1"))

    val usersToErase = Seq(3L, 7L, 11L, 17L, 23L, 31L)
    val erased = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val eraserDone = new java.util.concurrent.atomic.AtomicBoolean(false)

    val eraser = new Thread(() => {
      try usersToErase.foreach { u =>
        // a production caller's loop: CommitConflict means a racing
        // rewrite invalidated the plan — replan and try again
        // (eraseDv itself already retries 5× internally)
        var attempts = 0
        var done = false
        while (!done) {
          try {
            fis.eraseDv(spark, root, u, s"dve-$u")
            // true = newly ledgered, false = an earlier attempt's
            // commit landed — either way the erasure is confirmed
            erased.add(u); done = true
          } catch {
            case _: fis.CommitConflict =>
              attempts += 1
              if (attempts > 50)
                throw new IllegalStateException(
                  s"erase of $u never converged after $attempts conflicts")
          }
        }
      } catch {
        case e: Throwable => failures.add(s"eraser: $e")
      } finally eraserDone.set(true)
    })

    // sustained rewrite pressure: each round absorbs a fresh small
    // generation (erase-set users EXCLUDED, so re-added rows can't
    // masquerade as resurrections) and compacts it into the table —
    // every fold retires exactly the files the racing erases target
    val pressure = synth
      .filter(!col("user_id").isin(usersToErase: _*))
      .limit(300)
    val compactor = new Thread(() => {
      try {
        var rounds = 0
        while (!eraserDone.get() || rounds == 0) {
          rounds += 1
          fis.absorb(spark, root,
            pressure.withColumn("event_id",
              col("event_id") + lit(1000000L * rounds)),
            s"inc-r$rounds")
          fis.compact(spark, root) // None on conflict/no-op — by design
        }
        // one final fold AFTER the last erase, so the end state also
        // exercises vector folding of the late erases
        fis.compact(spark, root)
      } catch {
        case e: Throwable => failures.add(s"compactor: $e")
      }
    })

    eraser.start(); compactor.start()
    eraser.join(300000); compactor.join(300000)
    assert(!eraser.isAlive && !compactor.isAlive, "soak threads hung")
    assert(failures.isEmpty, s"soak thread failed: $failures")

    // every confirmed erasure holds in the final read
    import scala.jdk.CollectionConverters._
    val gone = erased.asScala.toSet
    assert(gone == usersToErase.toSet, s"not every erase confirmed: $gone")
    val remaining = fis.readPairs(spark, root, fis.livePairs(spark, root))
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    val resurrected = gone.intersect(remaining)
    assert(resurrected.isEmpty,
      s"confirmed erasures resurfaced after racing maintenance: $resurrected")
    // the survivors are intact (no over-deletion by a raced rewrite)
    assert(remaining == (0L until 40L).toSet -- gone)

    // and every maint commit that landed audits clean — folded-row
    // declarations stayed exact under the races
    val audit = fis.auditMaint(spark, root)
    assert(audit.forall(_._6), s"a raced maint commit audits dirty: $audit")
  }
}
