package graft.config

/**
 * Late-binding `${macro}` substitution — the reference's macro system
 * re-expressed for a Spark runner (reference `Lookup.java:333-359`: every
 * config property is `@Macro`-annotated; `containsMacro` guards skip
 * validation of unresolved properties at `406-409`/`412-427`, and planning
 * is deferred entirely while macros remain, `193-195`/`468-470`).
 *
 * In CDAP the platform substitutes runtime arguments between deploy time
 * and run time. Our equivalent: a config may carry `${name}` placeholders;
 * [[resolve]] substitutes them from a variable map, and validation treats
 * a still-macro'd property as "unknowable yet" — its checks are deferred,
 * not failed (the reference behavior). Execution, however, requires a
 * fully-resolved config: `LookupTransform.apply` rejects configs with
 * unresolved macros, because a join cannot be planned against a
 * placeholder field name.
 */
object Macros {

  private val Pattern = raw"\$$\{([^}]+)\}".r

  /** True iff the value contains at least one `${...}` placeholder
    * (reference `containsMacro(propertyName)` per-property guard). */
  def containsMacro(s: String): Boolean =
    s != null && Pattern.findFirstIn(s).isDefined

  /** Substitute every `${name}` whose `name` is present in `vars`;
    * placeholders with no binding are left in place, keeping the config
    * in the deferred state (the reference keeps deferring until the
    * platform supplies all runtime arguments). */
  def resolve(s: String, vars: Map[String, String]): String =
    if (s == null) s
    else Pattern.replaceAllIn(s, m =>
      vars.get(m.group(1)) match {
        case Some(v) => scala.util.matching.Regex.quoteReplacement(v)
        case None => scala.util.matching.Regex.quoteReplacement(m.matched)
      })

  /** Names of the `${...}` placeholders remaining in the value. */
  def macroNames(s: String): Seq[String] =
    if (s == null) Nil else Pattern.findAllMatchIn(s).map(_.group(1)).toSeq
}
