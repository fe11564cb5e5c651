package graft.triggers

import java.time.Instant
import graft.core.BsonBinary

/** The trigger predicate language: 9 match operators over dynamic
  * values (SURVEY §2.7; reference `value_match_operators.ex`).
  *
  * Ordering follows the reference's host-language term order so that
  * mixed-type comparisons never throw: numbers < booleans < datetimes
  * < lists < strings/binaries. Within a class: numeric order, `false <
  * true`, chronological, element-wise, byte-lexicographic. A null
  * value never matches an ordering operator; `ANY` matches everything
  * including null.
  */
sealed trait MatchOperator
object MatchOperator {
  case object Any              extends MatchOperator
  case object EqualTo          extends MatchOperator
  case object NotEqualTo       extends MatchOperator
  case object GreaterThan      extends MatchOperator
  case object GreaterOrEqualTo extends MatchOperator
  case object LessThan         extends MatchOperator
  case object LessOrEqualTo    extends MatchOperator
  case object Contains         extends MatchOperator
  case object NotContains      extends MatchOperator

  def fromName(s: String): Option[MatchOperator] = s.toUpperCase match {
    case "ANY"                 => Some(Any)
    case "EQUAL_TO"            => Some(EqualTo)
    case "NOT_EQUAL_TO"        => Some(NotEqualTo)
    case "GREATER_THAN"        => Some(GreaterThan)
    case "GREATER_OR_EQUAL_TO" => Some(GreaterOrEqualTo)
    case "LESS_THAN"           => Some(LessThan)
    case "LESS_OR_EQUAL_TO"    => Some(LessOrEqualTo)
    case "CONTAINS"            => Some(Contains)
    case "NOT_CONTAINS"        => Some(NotContains)
    case _                     => None
  }
}

object ValueMatch {
  import MatchOperator._

  /** Does `value <op> known` hold? */
  def matches(value: Any, op: MatchOperator, known: Any): Boolean = op match {
    case Any => true
    case EqualTo => eq2(value, known)
    case NotEqualTo => !eq2(value, known)
    case GreaterThan => value != null && compare(value, known) > 0
    case GreaterOrEqualTo => value != null && compare(value, known) >= 0
    case LessThan => value != null && compare(value, known) < 0
    case LessOrEqualTo => value != null && compare(value, known) <= 0
    case Contains => contains(value, known)
    // NOT_CONTAINS is false (not true) for non-container types —
    // preserve the reference's asymmetry (value_match_operators.ex:52-74).
    case NotContains => value match {
      case _: String | _: Seq[_] => !contains(value, known)
      case _ => false
    }
  }

  private def eq2(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case (x: Number, y: Number) => x.doubleValue == y.doubleValue
    case _ => a == b
  }

  private def rank(v: Any): Int = v match {
    case _: Number => 0
    case _: Boolean => 1
    case _: Instant => 2
    case _: Seq[_] => 3
    case _: String => 4
    case _: Array[Byte] => 4
    case _: BsonBinary => 4
    case _ => 5
  }

  private def compare(a: Any, b: Any): Int = {
    val (ra, rb) = (rank(a), rank(b))
    if (ra != rb) Integer.compare(ra, rb)
    else (a, b) match {
      case (x: Number, y: Number) => java.lang.Double.compare(x.doubleValue, y.doubleValue)
      case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
      case (x: Instant, y: Instant) => x.compareTo(y)
      case (x: Seq[_], y: Seq[_]) =>
        x.iterator.zip(y.iterator)
          .map { case (xe, ye) => compare(xe, ye) }
          .find(_ != 0)
          .getOrElse(Integer.compare(x.size, y.size))
      case (x, y) => byteLex(toBytes(x), toBytes(y))
    }
  }

  private def toBytes(v: Any): Array[Byte] = v match {
    case s: String => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    case b: Array[Byte] => b
    case BsonBinary(_, b) => b
    case other => other.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  private def byteLex(x: Array[Byte], y: Array[Byte]): Int =
    java.util.Arrays.compareUnsigned(x, y)

  private def contains(value: Any, known: Any): Boolean = value match {
    case s: String => known match {
      case k: String => s.contains(k)
      case _ => false
    }
    case xs: Seq[_] => xs.exists(e => eq2(e, known))
    case _ => false
  }
}
