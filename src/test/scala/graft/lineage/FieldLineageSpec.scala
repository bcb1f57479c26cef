package graft.lineage

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.LookupConfig

/** Mirrors reference `Lookup.java:134-184` op construction. */
class FieldLineageSpec extends AnyFunSuite {

  private val inputSchema = StructType(Seq(
    StructField("customer_id", IntegerType),
    StructField("first_name", StringType),
    StructField("last_name", StringType)))

  private val cfg = LookupConfig("phone_numbers", "customer_id", "customer_id",
    "phone_number", outputField = Some("phone"))

  test("emits Join, Identity per pass-through (skipping the key), then Rename") {
    val ops = FieldLineage.operations(cfg, "customers", inputSchema)
    val join = ops.head.asInstanceOf[JoinOperation]
    assert(join.inputs == List("customers.customer_id", "phone_numbers.customer_id"))
    assert(join.outputs == List("customer_id", "customer_id"))

    val identities = ops.collect { case i: IdentityOperation => i }
    assert(identities.map(_.outputs.head) == List("first_name", "last_name"),
      "join key must be skipped in identity ops (Lookup.java:162-166)")
    assert(identities.head.inputs == List("customers.first_name"))

    val rename = ops.last.asInstanceOf[RenameOperation]
    assert(rename.inputs == List("phone_numbers.phone_number"))
    assert(rename.outputs == List("phone"))
  }

  test("rename target honors the E4 alias default") {
    val ops = FieldLineage.operations(cfg.copy(outputField = None), "customers", inputSchema)
    assert(ops.last.outputs == List("phone_number"))
  }
}
