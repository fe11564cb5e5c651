package graft.core

/** A small synchronized LRU memo for per-root control-plane caches
  * (schema logs, banding schemes, live deletion-vector sets). The
  * unbounded `ConcurrentHashMap` versions of these never evicted a
  * retired root, so a process cycling many temporary roots (soaks,
  * spec runs, multi-tenant maintenance) grew driver memory one entry
  * per root forever. Access-ordered with `max` entries: the hot
  * working set stays cached, retired roots age out.
  *
  * The loader in [[getOrElseUpdate]] runs OUTSIDE the lock — it may
  * launch a Spark job, and holding the memo lock across a job would
  * serialize unrelated roots' cache misses. A racing double-compute
  * is benign: every cached value here is an idempotent control-plane
  * read.
  */
final class BoundedMemo[K, V](max: Int, name: String = "") {
  if (name.nonEmpty) BoundedMemo.register(name, this)

  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      this.size() > max
  }

  def get(k: K): Option[V] = m.synchronized(Option(m.get(k)))

  def put(k: K, v: V): Unit = m.synchronized { m.put(k, v); () }

  def getOrElseUpdate(k: K)(load: => V): V =
    get(k).getOrElse { val v = load; put(k, v); v }

  /** Current entry count — bounded by `max`; exposed so soaks can pin
    * the no-growth property. */
  def size: Int = m.synchronized(m.size())
}

/** Registry of every NAMED memo in the process, so one soak can pin
  * that no per-root cache anywhere in main grows past its bound —
  * a new memo added with a name is covered automatically instead of
  * silently reopening the unbounded-growth hole. */
object BoundedMemo {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, BoundedMemo[_, _]]()

  private def register(name: String, memo: BoundedMemo[_, _]): Unit =
    registry.put(name, memo)

  /** Entry counts of every named memo that has been touched by this
    * process (registration happens at owning-object init). */
  def sizes: Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    registry.asScala.map { case (n, m) => n -> m.size }.toMap
  }
}
