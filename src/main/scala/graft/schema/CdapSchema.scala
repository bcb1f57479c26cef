package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/**
 * Translator between the Avro-style record-schema JSON dialect the
 * reference accepts for its `schema` config property (reference
 * `Lookup.java:396` — `Schema.parseJson(...)`) and Spark's `StructType`.
 *
 * The dialect (exercised at reference `LookupTest.java:56-73`):
 *   - a record: `{"type":"record","name":"n","fields":[{"name":"f","type":T},...]}`
 *   - primitives: `"boolean" | "int" | "long" | "float" | "double" | "bytes" | "string" | "null"`
 *   - nullable-as-union: `["string","null"]` (reference `Schema.nullableOf`,
 *     `Lookup.java:456-457`) — nullability is a type *wrapper*, not a field flag
 *   - arrays `{"type":"array","items":T}`, maps `{"type":"map","keys":K,"values":V}`
 *     (CDAP maps carry a key schema, unlike Avro), nested records, enums (→ string),
 *   - logical types: `{"type":"int","logicalType":"date"}`,
 *     `{"type":"long","logicalType":"timestamp-micros"}`,
 *     `{"type":"long","logicalType":"time-micros"}`,
 *     `{"type":"bytes","logicalType":"decimal","precision":p,"scale":s}`.
 *
 * `DataType.fromJson` speaks Spark's own JSON dialect, which is not
 * compatible, hence this translator (SURVEY.md §1.2/§7.4).
 */
object CdapSchema {
  private val mapper = new ObjectMapper()

  /** Parse CDAP/Avro-style schema JSON into a StructType. Top level must be a record. */
  def parse(json: String): StructType = {
    val node = mapper.readTree(json)
    toDataType(node) match {
      case (st: StructType, _) => st
      case (other, _) =>
        throw new IllegalArgumentException(
          s"Top-level schema must be a record, got: ${other.simpleString}")
    }
  }

  /** Render a StructType as CDAP/Avro-style schema JSON (the reverse direction). */
  def toJson(schema: StructType, recordName: String = "record"): String =
    mapper.writeValueAsString(fromStruct(schema, recordName))

  /** Returns (dataType, nullable). */
  private def toDataType(node: JsonNode): (DataType, Boolean) = {
    if (node.isTextual) (primitive(node.asText()), node.asText() == "null")
    else if (node.isArray) { // union: nullable iff it contains "null"
      val members = node.elements().asScala.toList
      val (nulls, rest) = members.partition(m => m.isTextual && m.asText() == "null")
      rest match {
        case single :: Nil =>
          val (dt, _) = toDataType(single)
          (dt, nulls.nonEmpty)
        case _ =>
          throw new IllegalArgumentException(
            s"Only [T, null] unions are supported, got: $node")
      }
    } else if (node.isObject) {
      val tpe = Option(node.get("type")).map(_.asText()).getOrElse(
        throw new IllegalArgumentException(s"Schema object missing 'type': $node"))
      val logical = Option(node.get("logicalType")).map(_.asText())
      (tpe, logical) match {
        case ("int", Some("date")) => (DateType, false)
        case ("long", Some("timestamp-micros" | "timestamp-millis")) =>
          (TimestampType, false)
        case ("long", Some("time-micros")) => (LongType, false)
        case ("bytes" | "fixed", Some("decimal")) =>
          val p = Option(node.get("precision")).map(_.asInt()).getOrElse(38)
          val s = Option(node.get("scale")).map(_.asInt()).getOrElse(0)
          (DecimalType(p, s), false)
        case ("record", _) =>
          val fields = node.get("fields").elements().asScala.map { f =>
            val name = f.get("name").asText()
            val (dt, nullable) = toDataType(f.get("type"))
            StructField(name, dt, nullable)
          }.toArray
          (StructType(fields), false)
        case ("array", _) =>
          val (el, elNullable) = toDataType(node.get("items"))
          (ArrayType(el, containsNull = elNullable), false)
        case ("map", _) =>
          val (v, vNullable) = toDataType(node.get("values"))
          (MapType(StringType, v, valueContainsNull = vNullable), false)
        case ("enum", _) => (StringType, false)
        case (p, _) => (primitive(p), p == "null")
      }
    } else throw new IllegalArgumentException(s"Unsupported schema node: $node")
  }

  private def primitive(name: String): DataType = name match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "bytes" => BinaryType
    case "string" => StringType
    case "null" => NullType
    case other => throw new IllegalArgumentException(s"Unknown schema type: $other")
  }

  private def fromStruct(schema: StructType, name: String): ObjectNode = {
    val rec = mapper.createObjectNode()
    rec.put("type", "record")
    rec.put("name", name)
    val fields = mapper.createArrayNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fn = mapper.createObjectNode()
      fn.put("name", f.name)
      fn.set[JsonNode]("type", typeNode(f.dataType, f.nullable, s"${name}_${f.name}"))
      fields.add(fn)
    }
    rec.set[JsonNode]("fields", fields)
    rec
  }

  private def typeNode(dt: DataType, nullable: Boolean, name: String): JsonNode = {
    val base: JsonNode = dt match {
      case BooleanType => mapper.getNodeFactory.textNode("boolean")
      case IntegerType | ShortType | ByteType => mapper.getNodeFactory.textNode("int")
      case LongType => mapper.getNodeFactory.textNode("long")
      case FloatType => mapper.getNodeFactory.textNode("float")
      case DoubleType => mapper.getNodeFactory.textNode("double")
      case BinaryType => mapper.getNodeFactory.textNode("bytes")
      case StringType => mapper.getNodeFactory.textNode("string")
      case DateType =>
        val n = mapper.createObjectNode()
        n.put("type", "int"); n.put("logicalType", "date"); n
      case TimestampType =>
        val n = mapper.createObjectNode()
        n.put("type", "long"); n.put("logicalType", "timestamp-micros"); n
      case d: DecimalType =>
        val n = mapper.createObjectNode()
        n.put("type", "bytes"); n.put("logicalType", "decimal")
        n.put("precision", d.precision); n.put("scale", d.scale); n
      case ArrayType(el, containsNull) =>
        val n = mapper.createObjectNode()
        n.put("type", "array")
        n.set[JsonNode]("items", typeNode(el, containsNull, name + "_item")); n
      case MapType(_, v, vNull) =>
        val n = mapper.createObjectNode()
        n.put("type", "map")
        n.set[JsonNode]("keys", mapper.getNodeFactory.textNode("string"))
        n.set[JsonNode]("values", typeNode(v, vNull, name + "_value")); n
      case st: StructType => fromStruct(st, name)
      case other =>
        throw new IllegalArgumentException(s"Unsupported Spark type: $other")
    }
    if (nullable) {
      val u = mapper.createArrayNode()
      u.add(base); u.add("null"); u
    } else base
  }
}
