package graft.triggers

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import graft.triggers.MatchOperator._

/** Operator truth tables mirroring the reference's public coverage
  * (value_match_operators_test.exs): nil handling, numeric, lexical
  * string, and boolean ordering, container membership, and the
  * NOT_CONTAINS asymmetry.
  */
class ValueMatchSpec extends AnyFunSuite {
  private def m(v: Any, op: MatchOperator, k: Any) = ValueMatch.matches(v, op, k)

  test("ANY matches everything including nil") {
    assert(m(null, Any, null))
    assert(m(42, Any, "ignored"))
  }

  test("EQUAL_TO / NOT_EQUAL_TO") {
    assert(m(42, EqualTo, 42))
    assert(m(42.0, EqualTo, 42))
    assert(!m(42, EqualTo, 43))
    assert(m("a", EqualTo, "a"))
    assert(m(null, EqualTo, null))
    assert(!m(null, EqualTo, 1))
    assert(m(42, NotEqualTo, 43))
    assert(!m(42, NotEqualTo, 42))
    assert(m(Array[Byte](1, 2), EqualTo, Array[Byte](1, 2)))
  }

  test("ordering: numeric") {
    assert(m(5, GreaterThan, 4))
    assert(!m(5, GreaterThan, 5))
    assert(m(5, GreaterOrEqualTo, 5))
    assert(m(4.9, LessThan, 5))
    assert(m(5L, LessOrEqualTo, 5))
  }

  test("ordering: nil never matches") {
    assert(!m(null, GreaterThan, 1))
    assert(!m(null, LessThan, 1))
    assert(!m(null, GreaterOrEqualTo, 1))
    assert(!m(null, LessOrEqualTo, 1))
  }

  test("ordering: lexical strings") {
    assert(m("beta", GreaterThan, "alpha"))
    assert(m("alpha", LessThan, "beta"))
    assert(m("a", LessThan, "ab"))
  }

  test("ordering: booleans, false < true") {
    assert(m(true, GreaterThan, false))
    assert(m(false, LessThan, true))
    assert(!m(false, GreaterThan, true))
    assert(m(true, GreaterOrEqualTo, true))
  }

  test("ordering: datetimes chronological") {
    val t1 = Instant.ofEpochMilli(1000)
    val t2 = Instant.ofEpochMilli(2000)
    assert(m(t2, GreaterThan, t1))
    assert(m(t1, LessThan, t2))
  }

  test("ordering: mixed types never throw, rank by class") {
    // numbers sort below strings (host term order) — must not throw
    assert(m("x", GreaterThan, 5))
    assert(!m(5, GreaterThan, "x"))
    assert(m(true, GreaterThan, 100))
  }

  test("CONTAINS: substring on strings") {
    assert(m("hello world", Contains, "lo wo"))
    assert(!m("hello", Contains, "xyz"))
    assert(!m("hello", Contains, 5))
  }

  test("CONTAINS: membership on arrays") {
    assert(m(List(1, 2, 3), Contains, 2))
    assert(!m(List(1, 2, 3), Contains, 9))
    assert(m(List("a", "b"), Contains, "b"))
  }

  test("CONTAINS: false on other types") {
    assert(!m(42, Contains, 4))
    assert(!m(null, Contains, "x"))
  }

  test("NOT_CONTAINS: negation for containers, false otherwise") {
    assert(m("hello", NotContains, "xyz"))
    assert(!m("hello", NotContains, "ell"))
    assert(m(List(1, 2), NotContains, 3))
    // asymmetry: false (not true!) for non-container types
    assert(!m(42, NotContains, 4))
    assert(!m(null, NotContains, "x"))
  }
}
