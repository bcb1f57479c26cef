package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class CdapSchemaSpec extends AnyFunSuite {

  test("parses the reference test schema shape (LookupTest.java:56-73)") {
    val json =
      """{"type":"record","name":"customer","fields":[
        |{"name":"customer_id","type":"int"},
        |{"name":"first_name","type":"string"},
        |{"name":"last_name","type":"string"},
        |{"name":"phone","type":["string","null"]}]}""".stripMargin
    val st = CdapSchema.parse(json)
    assert(st == StructType(Seq(
      StructField("customer_id", IntegerType, nullable = false),
      StructField("first_name", StringType, nullable = false),
      StructField("last_name", StringType, nullable = false),
      StructField("phone", StringType, nullable = true))))
  }

  test("null-first unions and all primitives") {
    val json =
      """{"type":"record","name":"r","fields":[
        |{"name":"b","type":"boolean"},{"name":"i","type":"int"},
        |{"name":"l","type":"long"},{"name":"f","type":"float"},
        |{"name":"d","type":"double"},{"name":"y","type":"bytes"},
        |{"name":"s","type":"string"},{"name":"n","type":["null","double"]}]}""".stripMargin
    val st = CdapSchema.parse(json)
    assert(st("n") == StructField("n", DoubleType, nullable = true))
    assert(st("y").dataType == BinaryType)
    assert(st("b").dataType == BooleanType)
  }

  test("logical types: date, timestamp-micros, decimal") {
    val json =
      """{"type":"record","name":"r","fields":[
        |{"name":"d","type":{"type":"int","logicalType":"date"}},
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}},
        |{"name":"dec","type":{"type":"bytes","logicalType":"decimal","precision":10,"scale":2}}]}""".stripMargin
    val st = CdapSchema.parse(json)
    assert(st("d").dataType == DateType)
    assert(st("ts").dataType == TimestampType)
    assert(st("dec").dataType == DecimalType(10, 2))
  }

  test("arrays, maps, nested records, enums") {
    val json =
      """{"type":"record","name":"r","fields":[
        |{"name":"arr","type":{"type":"array","items":["double","null"]}},
        |{"name":"m","type":{"type":"map","keys":"string","values":"long"}},
        |{"name":"nest","type":{"type":"record","name":"inner","fields":[
        |  {"name":"x","type":"int"}]}},
        |{"name":"e","type":{"type":"enum","name":"col","symbols":["A","B"]}}]}""".stripMargin
    val st = CdapSchema.parse(json)
    assert(st("arr").dataType == ArrayType(DoubleType, containsNull = true))
    assert(st("m").dataType == MapType(StringType, LongType, valueContainsNull = false))
    assert(st("nest").dataType == StructType(Seq(StructField("x", IntegerType, nullable = false))))
    assert(st("e").dataType == StringType)
  }

  test("round-trips StructType → JSON → StructType") {
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("scores", ArrayType(FloatType, containsNull = false), nullable = true),
      StructField("when", TimestampType, nullable = false)))
    assert(CdapSchema.parse(CdapSchema.toJson(st)) == st)
  }

  test("rejects non-record top level and unknown types") {
    intercept[IllegalArgumentException](CdapSchema.parse("\"string\""))
    intercept[IllegalArgumentException](CdapSchema.parse(
      """{"type":"record","name":"r","fields":[{"name":"x","type":"wibble"}]}"""))
  }
}
