package graft.functions.catalyst

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Native dot product over two `array<float>` columns in double precision.
 *
 * Determinism contract (shared with VectorFunctions and the SQL oracle):
 * accumulation is sequential in ascending index — identical to the
 * left-associated `t1+t2+…` chain the oracle evaluates — so scores are
 * bit-identical to the unrolled-expression formulation, just ~10× faster:
 * direct float-array access instead of per-element `element_at` bounds and
 * null checks, and no 64-node expression tree for codegen to chew on.
 */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_f32"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductF32 = copy(left = newLeft, right = newRight)
}

/**
 * Sign-random-projection LSH bucket over an `array<float>` vector: bit j
 * of the result is set iff the dot product with deterministic public
 * hyperplane j is > 0 (planes from the Knuth-mix formula in
 * `VectorFunctions.planeWeight` — replayable by any engine). Semantically
 * identical to the unrolled `lshBucketHof` chain (same ascending-index
 * left-assoc accumulation), but one tight nested loop instead of a
 * dim×nPlanes expression tree — the 512-node tree was the q19 hot spot.
 */
case class SrpBucketF32(child: Expression, dim: Int, nPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import graft.functions.TextFunctions.{Mix, TwoPow32}

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_srp_bucket"

  protected override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      var proj = 0.0
      var a = 0
      while (a < n) {
        val w = ((j.toLong * dim + (a + 1)) * Mix) % TwoPow32 - (1L << 31)
        proj += v.getFloat(a).toDouble * w.toDouble
        a += 1
      }
      if (proj > 0) bucket += 1L << j
      j += 1
    }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val w = ctx.freshName("w")
      val proj = ctx.freshName("proj")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = Math.min($dim, $c.numElements());
         |long $bucket = 0L;
         |for (int $j = 0; $j < $nPlanes; $j++) {
         |  double $proj = 0.0;
         |  for (int $a = 0; $a < $n; $a++) {
         |    long $w = (((long) $j * $dim + ($a + 1)) * ${Mix}L) % ${TwoPow32}L - (1L << 31);
         |    $proj += (double) $c.getFloat($a) * (double) $w;
         |  }
         |  if ($proj > 0) $bucket += 1L << $j;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpBucketF32 =
    copy(child = newChild)
}
