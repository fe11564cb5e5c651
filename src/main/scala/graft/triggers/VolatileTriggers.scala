package graft.triggers

import graft.core.{Aggregation, Mapping, PathMatcher}
import graft.streaming.Registry

/** Volatile (session-scoped) trigger control plane — the RPC
  * `InstallVolatileTrigger` / `DeleteVolatileTrigger` surface
  * (SURVEY §2.1 S9, §3.3; reference `impl.ex:946-1189`).
  *
  * Volatile triggers are driver-side session state overlaid onto the
  * persistent trigger table per micro-batch (SURVEY §7.4 risk 4):
  * install validates synchronously and returns the reference's exact
  * error taxonomy; the overlay union is what the state machine sees.
  */
object VolatileTriggers {

  sealed trait InstallError
  case object InterfaceNotFound extends InstallError
  case object UnsupportedInterfaceAggregation extends InstallError
  case object InvalidMatchPath extends InstallError

  /** A path pattern is installable iff some endpoint template can
    * produce a path it matches: token counts equal, and each pattern
    * token is a wildcard (empty / `%{param}`), equal to the template
    * token, or instantiates a template parameter.
    */
  private[triggers] def patternMatchesTemplate(pattern: String, template: String): Boolean = {
    val pt = PathMatcher.tokens(pattern)
    val tt = PathMatcher.tokens(template)
    pt.length == tt.length && pt.indices.forall { i =>
      val p = pt(i); val t = tt(i)
      val pWild = p.isEmpty || (p.startsWith("%{") && p.endsWith("}"))
      val tParam = t.startsWith("%{") && t.endsWith("}")
      pWild || tParam || p == t
    }
  }

  /** Validate an install against the registry — the synchronous
    * RPC-reply path. Data triggers on object-aggregated interfaces
    * are rejected; path patterns must be resolvable against the
    * interface's endpoints (the automaton check). Data triggers must
    * attach to an interface scope (specific or any) — a device scope
    * would install successfully but never match a data event.
    */
  def validate(trigger: Trigger, registry: Registry): Either[InstallError, Trigger] =
    trigger.scope match {
      case TriggerScope.OnInterface(name, major) =>
        registry.descriptor(name) match {
          case None => Left(InterfaceNotFound)
          case Some(iface) if iface.major != major => Left(InterfaceNotFound)
          case Some(iface) =>
            if (isDataTrigger(trigger.eventType) && iface.aggregation == Aggregation.Object)
              Left(UnsupportedInterfaceAggregation)
            else trigger.pathPattern match {
              case None => Right(trigger.copy(volatile = true))
              case Some(p) =>
                val mappings: Seq[Mapping] = registry.mappingsOf(name)
                if (mappings.exists(m => patternMatchesTemplate(p, m.endpoint)))
                  Right(trigger.copy(volatile = true))
                else Left(InvalidMatchPath)
            }
        }
      case TriggerScope.OnDevice(_) | TriggerScope.AnyDevice
          if isDataTrigger(trigger.eventType) =>
        Left(InvalidMatchPath)
      case _ => Right(trigger.copy(volatile = true))
    }

  private def isDataTrigger(et: TriggerEventType): Boolean = et match {
    case TriggerEventType.IncomingData | TriggerEventType.ValueChange |
         TriggerEventType.ValueChangeApplied | TriggerEventType.PathCreated |
         TriggerEventType.PathRemoved | TriggerEventType.ValueStored => true
    case _ => false
  }

  /** Delete an installed trigger by id. The session keeps triggers
    * UNmerged (each install keeps its own id → targets association);
    * congruence merging happens only in [[overlay]]. Deleting one of
    * several congruent triggers therefore removes exactly its own
    * targets from the merged view — the reference's congruence-aware
    * delete (impl.ex:1099-1131) — without guessing which target
    * belonged to which id.
    */
  def deleteTarget(installed: Seq[Trigger], triggerId: String): Seq[Trigger] =
    installed.filterNot(_.triggerId == triggerId)

  /** J6: per-batch overlay of persistent + volatile triggers, merged
    * congruently.
    */
  def overlay(persistent: Seq[Trigger], volatileTs: Seq[Trigger]): Seq[Trigger] =
    Triggers.mergeCongruent(persistent ++ volatileTs)
}
