package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** IVF+SQ8 per-cell quantization kernels as LOOPING codegen expressions —
  * the [[PqExpressions]] pattern applied to the composite family.
  *
  * The first formulation unrolled one decode subtree PER DIMENSION with
  * the per-cell ranges as nested `element_at` literal lookups: at dim 64
  * that is ~12 element_at nodes per dim x 64 dims per expression, and the
  * janino compile of the resulting tree dominated the ENTIRE entry
  * (measured ~10s at sf0.01 AND sf0.1 — data-independent, so purely
  * plan/compile cost). These kernels keep the dense per-cell [lo, hi]
  * tables as flat reference objects and LOOP in generated code — compile
  * cost constant in dim and cell count.
  *
  * Numeric contract (bit-identical to the unrolled trees the DuckDB
  * oracles replay, so swapping the implementation cannot change a hash):
  *   - encode: raw = (span == 0) ? 0.0 : floor((x - lo) / span * 255.0
  *     + 0.5) in doubles, clamped to [0, 255], truncated to int — x is
  *     the float residual widened exactly;
  *   - decode: xh = (span == 0) ? lo : lo + code / 255.0 * span, in that
  *     association; diff = xh - qres[i] (float qres widens exactly);
  *   - per-dim micro-unit floor BEFORE the sum: floor(diff * diff *
  *     1000000.0 + 0.5) as long, summed in exact integer arithmetic.
  */
object IvfSq8Kernels {

  private def flat(a: Array[Array[Double]]): Array[Double] = {
    val dim = a(0).length
    val out = new Array[Double](a.length * dim)
    var c = 0
    while (c < a.length) { System.arraycopy(a(c), 0, out, c * dim, dim); c += 1 }
    out
  }

  /** codes[i] = clamped byte code of res[i] against cell centroidId's
    * [lo, hi] at dim i. Input: (res: array<float>, centroid_id: int);
    * ranges ship once as flat (cell x dim) reference objects.
    */
  case class IvfSq8Encode(left: Expression, right: Expression,
      lo: Array[Array[Double]], hi: Array[Array[Double]])
      extends BinaryExpression {
    private val dim = lo(0).length
    private lazy val loFlat = flat(lo)
    private lazy val hiFlat = flat(hi)

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = left.nullable || right.nullable

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"expected (array<float>, int), got ($l, $r)")
      }

    override def nullSafeEval(res: Any, cid: Any): Any = {
      val arr = res.asInstanceOf[ArrayData]
      val c = cid.asInstanceOf[Int]
      val n = math.min(arr.numElements(), dim)
      val out = new Array[Int](dim)
      var i = 0
      while (i < n) {
        val l = loFlat(c * dim + i)
        val span = hiFlat(c * dim + i) - l
        val raw =
          if (span == 0.0) 0.0
          else math.floor((arr.getFloat(i).toDouble - l) / span * 255.0 + 0.5)
        out(i) = math.min(math.max(raw, 0.0), 255.0).toInt
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val loRef = ctx.addReferenceObj("isq8Lo", loFlat, "double[]")
      val hiRef = ctx.addReferenceObj("isq8Hi", hiFlat, "double[]")
      val gad = classOf[GenericArrayData].getName
      nullSafeCodeGen(ctx, ev, (res, cid) => {
        val n = ctx.freshName("n"); val out = ctx.freshName("out")
        val i = ctx.freshName("i"); val l = ctx.freshName("l")
        val span = ctx.freshName("span"); val raw = ctx.freshName("raw")
        s"""
           |int $n = java.lang.Math.min($res.numElements(), $dim);
           |int[] $out = new int[$dim];
           |for (int $i = 0; $i < $n; $i++) {
           |  double $l = $loRef[$cid * $dim + $i];
           |  double $span = $hiRef[$cid * $dim + $i] - $l;
           |  double $raw = ($span == 0.0) ? 0.0
           |    : java.lang.Math.floor((((double) $res.getFloat($i)) - $l) / $span * 255.0 + 0.5);
           |  $out[$i] = (int) java.lang.Math.min(java.lang.Math.max($raw, 0.0), 255.0);
           |}
           |${ev.value} = new $gad($out);
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** dist_u = sum over dims of floor((decode(cid, i, codes[i]) -
    * qres[i])^2 * 1e6 + 0.5) as exact long. Input: (codes: array<int>,
    * centroid_id: int, qres: array<float|double>).
    */
  case class IvfSq8Dist(first: Expression, second: Expression, third: Expression,
      lo: Array[Array[Double]], hi: Array[Array[Double]])
      extends TernaryExpression {
    private val dim = lo(0).length
    private lazy val loFlat = flat(lo)
    private lazy val hiFlat = flat(hi)
    private def qresIsFloat: Boolean = third.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def dataType: DataType = LongType
    override def nullable: Boolean =
      first.nullable || second.nullable || third.nullable

    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (ArrayType(IntegerType, _), IntegerType, ArrayType(FloatType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (ArrayType(IntegerType, _), IntegerType, ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (a, b, c) => TypeCheckResult.TypeCheckFailure(
          s"expected (array<int>, int, array<float|double>), got ($a, $b, $c)")
      }

    override def nullSafeEval(codes: Any, cid: Any, qres: Any): Any = {
      val cArr = codes.asInstanceOf[ArrayData]
      val c = cid.asInstanceOf[Int]
      val qArr = qres.asInstanceOf[ArrayData]
      val isF = qresIsFloat
      val n = math.min(math.min(cArr.numElements(), qArr.numElements()), dim)
      var acc = 0L
      var i = 0
      while (i < n) {
        val l = loFlat(c * dim + i)
        val span = hiFlat(c * dim + i) - l
        val xh = if (span == 0.0) l else l + cArr.getInt(i) / 255.0 * span
        val qx = if (isF) qArr.getFloat(i).toDouble else qArr.getDouble(i)
        val diff = xh - qx
        acc += math.floor(diff * diff * 1000000.0 + 0.5).toLong
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val loRef = ctx.addReferenceObj("isq8dLo", loFlat, "double[]")
      val hiRef = ctx.addReferenceObj("isq8dHi", hiFlat, "double[]")
      val qGet = if (qresIsFloat) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, (codes, cid, qres) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val l = ctx.freshName("l"); val span = ctx.freshName("span")
        val xh = ctx.freshName("xh"); val qx = ctx.freshName("qx")
        val diff = ctx.freshName("diff"); val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min(
           |  java.lang.Math.min($codes.numElements(), $qres.numElements()), $dim);
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $l = $loRef[$cid * $dim + $i];
           |  double $span = $hiRef[$cid * $dim + $i] - $l;
           |  double $xh = ($span == 0.0) ? $l : $l + $codes.getInt($i) / 255.0 * $span;
           |  double $qx = (double) $qres.$qGet($i);
           |  double $diff = $xh - $qx;
           |  $acc += (long) java.lang.Math.floor($diff * $diff * 1000000.0 + 0.5);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression) =
      copy(first = f, second = s, third = t)
  }

  def ivfSq8Encode(res: Column, centroidId: Column,
      lo: Array[Array[Double]], hi: Array[Array[Double]]): Column =
    GraftColumnBridge.column(IvfSq8Encode(
      GraftColumnBridge.expression(res), GraftColumnBridge.expression(centroidId),
      lo, hi))

  def ivfSq8Dist(codes: Column, centroidId: Column, qres: Column,
      lo: Array[Array[Double]], hi: Array[Array[Double]]): Column =
    GraftColumnBridge.column(IvfSq8Dist(
      GraftColumnBridge.expression(codes), GraftColumnBridge.expression(centroidId),
      GraftColumnBridge.expression(qres), lo, hi))
}
