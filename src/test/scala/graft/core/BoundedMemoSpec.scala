package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The per-root memo bound: cycling many roots (soaks, spec runs,
  * multi-tenant maintenance) must never grow driver memory one entry
  * per root forever — the LRU evicts retired roots, keeps the hot
  * working set, and ScanPruningSpec pins the store's memos are wired
  * through it.
  */
class BoundedMemoSpec extends AnyFunSuite {

  test("cycling 100 roots never grows the memo past its bound") {
    val m = new BoundedMemo[String, Int](64)
    (0 until 100).foreach { i =>
      val root = s"/tmp/graft-root-$i"
      assert(m.getOrElseUpdate(root)(i) == i)
      assert(m.size <= 64, s"memo grew to ${m.size} at root $i")
    }
    assert(m.size == 64)
    // LRU, not FIFO: the entries touched most recently survive
    assert(m.get("/tmp/graft-root-99").contains(99))
    assert(m.get("/tmp/graft-root-0").isEmpty)
  }

  test("get refreshes recency so hot entries survive churn") {
    val m = new BoundedMemo[Int, Int](4)
    (0 until 4).foreach(i => m.put(i, i))
    (0 until 100).foreach { i =>
      m.get(0) // keep key 0 hot
      m.put(100 + i, i)
    }
    assert(m.get(0).contains(0), "the hot entry was evicted")
    assert(m.size == 4)
  }
}
