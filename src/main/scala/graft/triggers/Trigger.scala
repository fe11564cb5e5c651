package graft.triggers

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.PathMatcher

/** The events a trigger can subscribe to (SURVEY §2.7 taxonomy;
  * reference `event_type_utils.ex:21-73`).
  */
sealed trait TriggerEventType
object TriggerEventType {
  case object IncomingData            extends TriggerEventType
  case object ValueChange             extends TriggerEventType
  case object ValueChangeApplied      extends TriggerEventType
  case object PathCreated             extends TriggerEventType
  case object PathRemoved             extends TriggerEventType
  case object ValueStored             extends TriggerEventType
  case object IncomingIntrospection   extends TriggerEventType
  case object InterfaceAdded          extends TriggerEventType
  case object InterfaceRemoved        extends TriggerEventType
  case object InterfaceMinorUpdated   extends TriggerEventType
  case object DeviceConnected         extends TriggerEventType
  case object DeviceDisconnected      extends TriggerEventType
  case object EmptyCacheReceived      extends TriggerEventType
  case object DeviceError             extends TriggerEventType
}

/** Trigger scope: what object it watches. The reference keys triggers
  * by (object_id, object_type) where object_type distinguishes
  * device / interface / any-interface / any-device scopes.
  */
sealed trait TriggerScope
object TriggerScope {
  /** A specific (interface, major). */
  final case class OnInterface(interfaceName: String, major: Int) extends TriggerScope
  /** Any interface of the device's introspection. */
  case object AnyInterface extends TriggerScope
  /** A specific device. */
  final case class OnDevice(deviceId: String) extends TriggerScope
  /** Any device in the realm. */
  case object AnyDevice extends TriggerScope
}

/** One data/device/introspection trigger: scope + optional path
  * pattern + value predicate, firing to one or more targets.
  * Congruent triggers (same predicate, different targets) are merged
  * by [[Triggers.mergeCongruent]] exactly as the reference does
  * (impl.ex:1550-1569).
  */
final case class Trigger(
    triggerId: String,
    eventType: TriggerEventType,
    scope: TriggerScope,
    pathPattern: Option[String],
    valueOp: MatchOperator,
    knownValue: Any,
    targets: List[String],
    volatile: Boolean = false) {

  /** Scala-side row-at-a-time evaluation (used inside the keyed state
    * machine where values are dynamic).
    */
  def matchesDataEvent(interface: String, major: Int, path: String, value: Any): Boolean = {
    val scopeOk = scope match {
      case TriggerScope.OnInterface(n, m) => n == interface && m == major
      case TriggerScope.AnyInterface => true
      case _ => false
    }
    scopeOk &&
      pathPattern.forall(p => PathMatcher.triggerPathMatches(p, path)) &&
      ValueMatch.matches(value, valueOp, knownValue)
  }
}

object Triggers {

  /** Merge congruent triggers: same (eventType, scope, pathPattern,
    * op, knownValue) → one trigger with the union of targets (sorted,
    * deduplicated). Mirrors the reference's congruence folding.
    */
  def mergeCongruent(ts: Seq[Trigger]): Seq[Trigger] =
    ts.groupBy(t => (t.eventType, t.scope, t.pathPattern, t.valueOp, t.knownValue))
      .map { case (_, group) =>
        group.head.copy(
          triggerId = group.map(_.triggerId).min,
          targets = group.flatMap(_.targets).distinct.sorted.toList,
          volatile = group.forall(_.volatile))
      }
      .toSeq
      .sortBy(_.triggerId)

  /** Compile a value predicate to a Spark Column over a typed value
    * column — the DataFrame-side twin of [[ValueMatch.matches]] for
    * batch/stream trigger joins. Null-guards ordering ops; preserves
    * the NOT_CONTAINS asymmetry for non-container columns.
    */
  def valuePredicate(value: Column, op: MatchOperator, known: Any, isArray: Boolean = false): Column = {
    import MatchOperator._
    def k: Column = lit(known)
    op match {
      case Any => lit(true)
      case EqualTo => value <=> k
      case NotEqualTo => !(value <=> k)
      case GreaterThan => value.isNotNull && value > k
      case GreaterOrEqualTo => value.isNotNull && value >= k
      case LessThan => value.isNotNull && value < k
      case LessOrEqualTo => value.isNotNull && value <= k
      case Contains =>
        if (isArray) array_contains(value, known) else value.contains(k)
      case NotContains =>
        if (isArray) value.isNotNull && !array_contains(value, known)
        else value.isNotNull && !value.contains(k)
    }
  }

  /** Compile a trigger path pattern to a Column predicate over a path
    * column: token count must match; empty pattern tokens are
    * wildcards. (The Column twin of PathMatcher.triggerPathMatches.)
    */
  def pathPredicate(path: Column, pattern: String): Column = {
    val patToks = PathMatcher.tokens(pattern)
    val pt = split(path, "/")
    val conds = patToks.zipWithIndex.map { case (tok, i) =>
      if (tok.isEmpty || (tok.startsWith("%{") && tok.endsWith("}"))) lit(true)
      else element_at(pt, i + 2) === tok // +2: leading "" from split
    }
    conds.foldLeft(size(pt) === patToks.length + 1)(_ && _)
  }
}
