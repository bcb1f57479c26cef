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
 * `Lookup.java:333-359`): our runner substitutes variables before
 * constructing this case class, so validation always sees final values
 * (SURVEY.md §2.1 row 3).
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

  /**
   * Required-property checks (reference `Config.validate`,
   * `Lookup.java:411-428`): each missing property adds one failure;
   * all failures accumulate before the collector throws.
   */
  def validateRequired(collector: FailureCollector): Unit = {
    def req(value: String, prop: String): Unit =
      if (value == null || value.isEmpty)
        collector.addFailure(s"Missing required property '$prop'.",
          correctiveAction = s"Set '$prop' in the lookup configuration.",
          property = prop)
    req(lookupDataset, "lookupDataset")
    req(inputKeyField, "inputKeyField")
    req(lookupKeyField, "lookupKeyField")
    req(lookupValueField, "lookupValueField")
  }
}
