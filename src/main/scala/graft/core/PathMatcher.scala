package graft.core

/** Endpoint path template matching, re-expressed from the reference's
  * automaton-based resolution (SURVEY §2.2 F5/F6; reference
  * `impl.ex:1610-1698`). The reference precompiles templates into an
  * automaton as an optimization; the semantics are token-wise match
  * where a `%{param}` template token is a single-token wildcard.
  */
object PathMatcher {

  /** Reject paths with empty tokens: interior `//` and trailing `/`
    * (a trailing empty token would bind a `%{param}` to "") — the
    * root path `/` itself is valid (object-aggregation target).
    * Reference F5.
    */
  def isValidPath(path: String): Boolean =
    path == "/" ||
      (path.nonEmpty && path.startsWith("/") && !path.contains("//") &&
        !path.endsWith("/"))

  private[graft] def tokens(s: String): Array[String] = {
    val stripped = s.stripPrefix("/")
    if (stripped.isEmpty) Array.empty else stripped.split("/", -1)
  }

  private def tokenMatches(tmpl: String, tok: String): Boolean =
    (tmpl.startsWith("%{") && tmpl.endsWith("}")) || tmpl == tok

  /** Exact template match: same token count, each template token
    * literal-equal or parametric.
    */
  def matches(template: String, path: String): Boolean = {
    val tt = tokens(template)
    val pt = tokens(path)
    tt.length == pt.length && tt.indices.forall(i => tokenMatches(tt(i), pt(i)))
  }

  /** Template match where the path addresses the template's parent
    * level (one above the leaf) — the rule for object-aggregated
    * interfaces, whose messages target the common prefix of all leaf
    * endpoints (reference `impl.ex:1679-1698`).
    */
  def matchesParentLevel(template: String, path: String): Boolean = {
    val tt = tokens(template)
    val pt = tokens(path)
    tt.length == pt.length + 1 &&
      pt.indices.forall(i => tokenMatches(tt(i), pt(i)))
  }

  /** Resolve a concrete path against an interface's mappings.
    * Individual aggregation: unique exact template match.
    * Object aggregation: path must be the parent of the leaves.
    */
  def resolve(
      mappings: Seq[Mapping],
      aggregation: Aggregation,
      path: String): Option[Mapping] =
    if (!isValidPath(path)) None
    else aggregation match {
      case Aggregation.Individual => mappings.find(m => matches(m.endpoint, path))
      case Aggregation.Object => mappings.find(m => matchesParentLevel(m.endpoint, path))
    }

  /** Extract `%{param}` bindings from a matched path. */
  def bindings(template: String, path: String): Map[String, String] = {
    val tt = tokens(template)
    val pt = tokens(path)
    tt.indices.collect {
      case i if tt(i).startsWith("%{") && tt(i).endsWith("}") =>
        tt(i).substring(2, tt(i).length - 1) -> pt(i)
    }.toMap
  }

  /** Trigger path-pattern match: like [[matches]] but the pattern's
    * empty tokens (from `%{param}`) are wildcards and token count must
    * match exactly (reference `impl.ex:1459-1469`).
    */
  def triggerPathMatches(pattern: String, path: String): Boolean = {
    val pat = tokens(pattern)
    val pt = tokens(path)
    pat.length == pt.length &&
      pat.indices.forall(i =>
        pat(i).isEmpty || tokenMatches(pat(i), pt(i)))
  }
}
