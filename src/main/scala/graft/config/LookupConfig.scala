package graft.config

import org.apache.spark.sql.types.StructType

/**
 * Configuration of the Lookup operator — the six public properties of the
 * reference plugin (reference `Lookup.java:322-371`, widget
 * `widgets/Lookup-batchjoiner.json`) plus the widget-only `defaultValue`
 * (declared in the UI spec at `widgets/Lookup-batchjoiner.json:45-51` but
 * never read by the reference's Config — we implement it properly as an
 * extension, applied as `coalesce(value, lit(default))`).
 *
 * `outputSchema` corresponds to the reference's optional explicit output
 * schema (`Lookup.java:348-350,396`): in CDAP it substitutes for unknown
 * design-time input schemas; in Spark schemas are always known once a
 * DataFrame exists, so we keep it as a *schema assertion* checked against
 * the actual join output (SURVEY.md §1.3).
 *
 * Any property may be late-bound (the reference's `${macro}` system,
 * `Lookup.java:333-359`): [[resolveMacros]] substitutes variables, and
 * while placeholders remain, validation of the affected properties is
 * deferred — not failed — mirroring the reference's `containsMacro`
 * guards (`Lookup.java:406-409,412-427`) and whole-config deferral
 * (`Lookup.java:193-195,468-470`). Execution requires a fully-resolved
 * config (SURVEY.md §2.1 row 3).
 *
 * @param lookupDataset    name of the input stage to treat as the lookup side
 * @param inputKeyField    join key column in the input dataset
 * @param lookupKeyField   join key column in the lookup dataset
 * @param lookupValueField column of the lookup dataset to append
 * @param outputField      alias for the appended column; defaults to
 *                         `lookupValueField` when absent/empty
 *                         (reference `Lookup.java:389-391`, E4)
 * @param outputSchemaJson optional CDAP-JSON output schema assertion
 * @param defaultValue     optional value for unmatched rows (extension)
 */
final case class LookupConfig(
    lookupDataset: String,
    inputKeyField: String,
    lookupKeyField: String,
    lookupValueField: String,
    outputField: Option[String] = None,
    outputSchemaJson: Option[String] = None,
    defaultValue: Option[String] = None) {

  /** E4: `outputField` defaults to `lookupValueField` (reference `Lookup.java:390`). */
  def resolvedOutputField: String =
    outputField.filter(_.nonEmpty).getOrElse(lookupValueField)

  def outputSchema: Option[StructType] =
    outputSchemaJson.filter(_.nonEmpty).map(graft.schema.CdapSchema.parse)

  /** All string-valued properties by name (the macro-substitutable
    * surface — every reference property is `@Macro`, `Lookup.java:333-359`). */
  private def properties: Seq[(String, String)] = Seq(
    "lookupDataset" -> lookupDataset,
    "inputKeyField" -> inputKeyField,
    "lookupKeyField" -> lookupKeyField,
    "lookupValueField" -> lookupValueField,
    "outputField" -> outputField.orNull,
    "outputSchemaJson" -> outputSchemaJson.orNull,
    "defaultValue" -> defaultValue.orNull)

  /** True iff any property still carries a `${...}` placeholder
    * (reference `fieldsContainMacros`, guard at `Lookup.java:468-470`). */
  def containsMacros: Boolean = properties.exists(p => Macros.containsMacro(p._2))

  /** Properties (name → unresolved macro names) still awaiting variables. */
  def unresolvedMacros: Seq[(String, Seq[String])] =
    properties.collect { case (n, v) if Macros.containsMacro(v) => n -> Macros.macroNames(v) }

  /** Substitute `${name}` placeholders from `vars` in every property —
    * the runner-side equivalent of CDAP's runtime-argument substitution.
    * Unknown names stay in place (config remains deferred). */
  def resolveMacros(vars: Map[String, String]): LookupConfig = {
    def r(s: String) = Macros.resolve(s, vars)
    copy(
      lookupDataset = r(lookupDataset),
      inputKeyField = r(inputKeyField),
      lookupKeyField = r(lookupKeyField),
      lookupValueField = r(lookupValueField),
      outputField = outputField.map(r),
      outputSchemaJson = outputSchemaJson.map(r),
      defaultValue = defaultValue.map(r))
  }

  /**
   * Required-property checks (reference `Config.validate`,
   * `Lookup.java:411-428`): each missing property adds one failure;
   * all failures accumulate before the collector throws. A property that
   * still contains a macro is SKIPPED, not failed — its final value is
   * unknowable until resolution (reference `containsMacro` guards,
   * `Lookup.java:412-427`).
   */
  def validateRequired(collector: FailureCollector): Unit = {
    def req(value: String, prop: String): Unit =
      if (!Macros.containsMacro(value) && (value == null || value.isEmpty))
        collector.addFailure(s"Missing required property '$prop'.",
          correctiveAction = s"Set '$prop' in the lookup configuration.",
          property = prop)
    req(lookupDataset, "lookupDataset")
    req(inputKeyField, "inputKeyField")
    req(lookupKeyField, "lookupKeyField")
    req(lookupValueField, "lookupValueField")
  }
}
