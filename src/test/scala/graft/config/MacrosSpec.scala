package graft.config

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.LookupTransform

/**
 * Macro/late-binding semantics (reference `Lookup.java:333-359`):
 * validation defers — never fails — for properties still carrying
 * `${...}` placeholders, substitution produces a config that validates
 * normally, and execution refuses an unresolved config with a targeted
 * error instead of a confusing missing-column failure.
 */
class MacrosSpec extends AnyFunSuite {

  private val macroCfg = LookupConfig(
    lookupDataset = "${lookup_stage}",
    inputKeyField = "c_nationkey",
    lookupKeyField = "${key_field}",
    lookupValueField = "n_name")

  test("containsMacro detects placeholders; plain strings pass through") {
    assert(Macros.containsMacro("${a}") && Macros.containsMacro("x_${a}_y"))
    assert(!Macros.containsMacro("plain") && !Macros.containsMacro("$a") &&
      !Macros.containsMacro(null))
    assert(Macros.macroNames("${a} and ${b}") == Seq("a", "b"))
  }

  test("macro'd property skips required-field validation (deferral, not failure)") {
    // Reference parity (Lookup.java:412-427): `${lookup_stage}` is not a
    // missing lookupDataset — its value is unknowable until resolution.
    val collector = new FailureCollector
    macroCfg.validateRequired(collector)
    assert(collector.isEmpty, collector.failures.mkString("; "))
    assert(macroCfg.containsMacros)
    assert(macroCfg.unresolvedMacros.map(_._1) ==
      Seq("lookupDataset", "lookupKeyField"))
  }

  test("an empty non-macro property still fails while macros defer") {
    val collector = new FailureCollector
    macroCfg.copy(lookupValueField = "").validateRequired(collector)
    assert(collector.failures.map(_.property) == List(Some("lookupValueField")))
  }

  test("resolved config validates normally and keeps unknown names deferred") {
    val partial = macroCfg.resolveMacros(Map("key_field" -> "n_nationkey"))
    assert(partial.lookupKeyField == "n_nationkey")
    assert(partial.containsMacros) // lookup_stage still unbound
    val full = partial.resolveMacros(Map("lookup_stage" -> "nation"))
    assert(!full.containsMacros)
    assert(full.lookupDataset == "nation")
    val collector = new FailureCollector
    full.validateRequired(collector)
    assert(collector.isEmpty)
  }

  test("execution rejects unresolved macros with a property-targeted error") {
    val spark = SparkSpec.session
    import spark.implicits._
    val input = Seq((1L, 10L)).toDF("c_custkey", "c_nationkey")
    val nation = Seq((10L, "FRANCE")).toDF("n_nationkey", "n_name")
    val inputs = Map("customer" -> input, "nation" -> nation)

    val e = intercept[ValidationException] {
      LookupTransform(inputs, macroCfg.resolveMacros(Map("lookup_stage" -> "nation")))
    }
    assert(e.failures.exists(f =>
      f.property.contains("lookupKeyField") && f.message.contains("${key_field}")))

    // fully resolved → the same config executes
    val out = LookupTransform(inputs, macroCfg.resolveMacros(
      Map("lookup_stage" -> "nation", "key_field" -> "n_nationkey")))
    assert(out.collect().map(_.getString(2)).toSeq == Seq("FRANCE"))
  }
}
