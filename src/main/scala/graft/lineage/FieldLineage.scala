package graft.lineage

import org.apache.spark.sql.types.StructType

import graft.config.LookupConfig

/**
 * Field-level provenance for the Lookup operator, mirroring the reference's
 * `createFieldOperations` (reference `Lookup.java:134-184`, recorded from
 * `prepareRun` at `Lookup.java:83-95`): one `Join` operation over the key
 * fields, `Identity` for every pass-through field, `Rename` for the aliased
 * lookup value field. Inputs are tagged `stage.field` exactly as the
 * reference does.
 *
 * Spark has no built-in field-lineage channel, so this is a pure function
 * over config + schemas producing the same records as a metadata
 * side-channel (SURVEY.md §2.1 row 4) — callers can ship them to whatever
 * catalog they use.
 */
sealed trait FieldOperation {
  def name: String
  def description: String
  def inputs: List[String]
  def outputs: List[String]
}

/** Reference op name "Join" (`Lookup.java:73`). */
final case class JoinOperation(inputs: List[String], outputs: List[String])
    extends FieldOperation {
  val name = "Join"
  val description = "Used as a key in the lookup"
}

/** Reference op name "Identity" (`Lookup.java:74`): field passes through unchanged. */
final case class IdentityOperation(field: String, stage: String)
    extends FieldOperation {
  val name = s"Identity $field"
  val description = "Unchanged during the lookup"
  val inputs = List(s"$stage.$field")
  val outputs = List(field)
}

/** Reference op name "Rename" (`Lookup.java:75`): the aliased lookup value. */
final case class RenameOperation(from: String, to: String, stage: String)
    extends FieldOperation {
  val name = s"Rename $from"
  val description = "Renamed as a part of the lookup"
  val inputs = List(s"$stage.$from")
  val outputs = List(to)
}

object FieldLineage {

  /**
   * Compute the operation list for one lookup (reference `Lookup.java:134-184`):
   *  1. a Join op: inputs = both `stage.key` refs, outputs = both key fields;
   *  2. Identity per input pass-through field, skipping the join key
   *     (`Lookup.java:162-166`);
   *  3. Rename for the lookup value field → output field.
   */
  def operations(cfg: LookupConfig, inputName: String,
      inputSchema: StructType): List[FieldOperation] = {
    val joinOp = JoinOperation(
      inputs = List(s"$inputName.${cfg.inputKeyField}",
        s"${cfg.lookupDataset}.${cfg.lookupKeyField}"),
      outputs = List(cfg.inputKeyField, cfg.lookupKeyField))
    val identities = inputSchema.fieldNames.toList
      .filterNot(_ == cfg.inputKeyField)
      .map(f => IdentityOperation(f, inputName))
    val rename = RenameOperation(cfg.lookupValueField, cfg.resolvedOutputField,
      cfg.lookupDataset)
    joinOp :: identities ::: List(rename)
  }
}
