package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Quantization kernels as LOOPING codegen expressions.
  *
  * The previous formulation of PQ encode / centroid assignment unrolled one
  * `struct(dist, k)` subtree PER CODEWORD into an `array_sort` comparator —
  * at the tested K=16 that is already a 128-node tree per row; at the
  * realistic K=256 it is a ~2,048-node tree that blows past janino method
  * limits (interpreted fallback or outright codegen failure). These
  * expressions keep the codebook as a flat reference object and LOOP over
  * it in generated code — the `MinhashSigsFromHashes` pattern — so compile
  * cost and method size are constant in K.
  *
  * Numeric contract (bit-identical to the unrolled trees and the DuckDB
  * oracle replays, so swapping the implementation cannot change a hash):
  *   - every dot/self-dot is a sequential left-to-right DOUBLE accumulation
  *     over the element order (float elements widen exactly), the VecDot
  *     convention;
  *   - PQ distance per codeword j evaluates as `d + cc[j] - 2.0*dot` in
  *     exactly that association, where d is the slice's self-dot;
  *   - argmin/argmax keep the EARLIEST index on ties (strict comparison),
  *     matching the old `(dist asc, k asc)` / `(dot desc, cid asc)`
  *     array_sort comparators — including the NaN case (a NaN distance
  *     never wins a strict comparison, so the earliest non-NaN extremum is
  *     chosen; all-NaN selects index 0, as sorting NaN-last did);
  *   - slices shorter than subDim (out-of-range `slice()` parity) fold
  *     over the common prefix only.
  */
object PqExpressions {

  /** codes = per-subspace argmin-L2 codeword of the vector's m-th slice,
    * computed against a flattened (subspaces x K x subDim) codebook
    * shipped once as a reference object. Input: array<float> of length
    * subspaces*subDim; output: array<int> of length subspaces.
    */
  case class PqEncode(child: Expression, codebook: Array[Array[Array[Float]]])
      extends UnaryExpression {
    private val subspaces = codebook.length
    private val k = codebook(0).length
    private val subDim = codebook(0)(0).length

    // flat codebook + precomputed codeword self-dots (sequential double
    // accumulation, the same values the old driver-side dotD produced)
    private lazy val cbFlat: Array[Float] = {
      val out = new Array[Float](subspaces * k * subDim)
      var m = 0
      while (m < subspaces) {
        var j = 0
        while (j < k) {
          System.arraycopy(codebook(m)(j), 0, out, (m * k + j) * subDim, subDim)
          j += 1
        }
        m += 1
      }
      out
    }
    private lazy val ccFlat: Array[Double] = {
      val out = new Array[Double](subspaces * k)
      var m = 0
      while (m < subspaces) {
        var j = 0
        while (j < k) {
          val c = codebook(m)(j)
          var acc = 0.0; var t = 0
          while (t < subDim) { acc += c(t).toDouble * c(t).toDouble; t += 1 }
          out(m * k + j) = acc
          j += 1
        }
        m += 1
      }
      out
    }

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected array<float>, got $dt")
    }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val codes = new Array[Int](subspaces)
      var m = 0
      while (m < subspaces) {
        val base = m * subDim
        val lim = math.min(base + subDim, n)
        var d = 0.0
        var t = base
        while (t < lim) { val x = arr.getFloat(t).toDouble; d += x * x; t += 1 }
        var best = 0; var bestDist = Double.PositiveInfinity
        var j = 0
        while (j < k) {
          val cbase = (m * k + j) * subDim
          var dot = 0.0
          var u = base
          while (u < lim) {
            dot += arr.getFloat(u).toDouble * cbFlat(cbase + (u - base)).toDouble
            u += 1
          }
          val dist = d + ccFlat(m * k + j) - 2.0 * dot
          if (dist < bestDist) { bestDist = dist; best = j }
          j += 1
        }
        codes(m) = best
        m += 1
      }
      new GenericArrayData(codes)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCb", cbFlat, "float[]")
      val ccRef = ctx.addReferenceObj("pqCc", ccFlat, "double[]")
      val gad = classOf[GenericArrayData].getName
      nullSafeCodeGen(ctx, ev, in => {
        val n = ctx.freshName("n"); val codes = ctx.freshName("codes")
        val m = ctx.freshName("m"); val j = ctx.freshName("j")
        val t = ctx.freshName("t"); val base = ctx.freshName("base")
        val lim = ctx.freshName("lim"); val d = ctx.freshName("d")
        val x = ctx.freshName("x"); val dot = ctx.freshName("dot")
        val dist = ctx.freshName("dist"); val best = ctx.freshName("best")
        val bestDist = ctx.freshName("bestDist"); val cbase = ctx.freshName("cbase")
        s"""
           |int $n = $in.numElements();
           |int[] $codes = new int[$subspaces];
           |for (int $m = 0; $m < $subspaces; $m++) {
           |  int $base = $m * $subDim;
           |  int $lim = java.lang.Math.min($base + $subDim, $n);
           |  double $d = 0.0;
           |  for (int $t = $base; $t < $lim; $t++) {
           |    double $x = (double) $in.getFloat($t);
           |    $d += $x * $x;
           |  }
           |  int $best = 0; double $bestDist = Double.POSITIVE_INFINITY;
           |  for (int $j = 0; $j < $k; $j++) {
           |    int $cbase = ($m * $k + $j) * $subDim;
           |    double $dot = 0.0;
           |    for (int $t = $base; $t < $lim; $t++) {
           |      $dot += ((double) $in.getFloat($t)) * ((double) $cbRef[$cbase + ($t - $base)]);
           |    }
           |    double $dist = $d + $ccRef[$m * $k + $j] - 2.0 * $dot;
           |    if ($dist < $bestDist) { $bestDist = $dist; $best = $j; }
           |  }
           |  $codes[$m] = $best;
           |}
           |${ev.value} = new $gad($codes);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Per-(query[, cell]) ADC distance TABLE: entry m*K + j = the
    * micro-unit floor of `(qs_m . qs_m + cc[m][j]) - 2 * qs_m . cb[m][j]`
    * over the residual's m-th slice — the driver dtab hoisted onto
    * executors ONCE per probe pair, so each candidate row downstream is M
    * table LOOKUPS instead of M slice+dot evaluations (the FAISS ADC-table
    * shape; measured ~20x on the corpus-scale annJoin). Arithmetic is the
    * exact sequence the old per-row expression pair (adcQq + codebook
    * dist) produced: sequential double dots over the float slice, the
    * `(qq + cc) - 2.0*dot` association, floor-to-micro-units per
    * subspace — so ranks are bit-identical and the DuckDB replays are
    * unchanged. Input: array<float> of length subspaces*subDim; output:
    * array<long> of length subspaces*K.
    */
  case class AdcDtab(child: Expression, codebook: Array[Array[Array[Float]]])
      extends UnaryExpression {
    private val subspaces = codebook.length
    private val k = codebook(0).length
    private val subDim = codebook(0)(0).length

    private lazy val cbFlat: Array[Float] = {
      val out = new Array[Float](subspaces * k * subDim)
      var m = 0
      while (m < subspaces) {
        var j = 0
        while (j < k) {
          System.arraycopy(codebook(m)(j), 0, out, (m * k + j) * subDim, subDim)
          j += 1
        }
        m += 1
      }
      out
    }
    private lazy val ccFlat: Array[Double] = {
      val out = new Array[Double](subspaces * k)
      var m = 0
      while (m < subspaces) {
        var j = 0
        while (j < k) {
          val c = codebook(m)(j)
          var acc = 0.0; var t = 0
          while (t < subDim) { acc += c(t).toDouble * c(t).toDouble; t += 1 }
          out(m * k + j) = acc
          j += 1
        }
        m += 1
      }
      out
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected array<float>, got $dt")
    }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Long](subspaces * k)
      var m = 0
      while (m < subspaces) {
        val base = m * subDim
        val lim = math.min(base + subDim, n)
        var qq = 0.0
        var t = base
        while (t < lim) { val x = arr.getFloat(t).toDouble; qq += x * x; t += 1 }
        var j = 0
        while (j < k) {
          val cbase = (m * k + j) * subDim
          var dot = 0.0
          var u = base
          while (u < lim) {
            dot += arr.getFloat(u).toDouble * cbFlat(cbase + (u - base)).toDouble
            u += 1
          }
          val d = qq + ccFlat(m * k + j) - 2.0 * dot
          out(m * k + j) = math.floor(d * 1000000.0 + 0.5).toLong
          j += 1
        }
        m += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("adcCb", cbFlat, "float[]")
      val ccRef = ctx.addReferenceObj("adcCc", ccFlat, "double[]")
      val gad = classOf[GenericArrayData].getName
      nullSafeCodeGen(ctx, ev, in => {
        val n = ctx.freshName("n"); val out = ctx.freshName("out")
        val m = ctx.freshName("m"); val j = ctx.freshName("j")
        val t = ctx.freshName("t"); val base = ctx.freshName("base")
        val lim = ctx.freshName("lim"); val qq = ctx.freshName("qq")
        val x = ctx.freshName("x"); val dot = ctx.freshName("dot")
        val d = ctx.freshName("d"); val cbase = ctx.freshName("cbase")
        s"""
           |int $n = $in.numElements();
           |long[] $out = new long[${subspaces * k}];
           |for (int $m = 0; $m < $subspaces; $m++) {
           |  int $base = $m * $subDim;
           |  int $lim = java.lang.Math.min($base + $subDim, $n);
           |  double $qq = 0.0;
           |  for (int $t = $base; $t < $lim; $t++) {
           |    double $x = (double) $in.getFloat($t);
           |    $qq += $x * $x;
           |  }
           |  for (int $j = 0; $j < $k; $j++) {
           |    int $cbase = ($m * $k + $j) * $subDim;
           |    double $dot = 0.0;
           |    for (int $t = $base; $t < $lim; $t++) {
           |      $dot += ((double) $in.getFloat($t)) * ((double) $cbRef[$cbase + ($t - $base)]);
           |    }
           |    double $d = $qq + $ccRef[$m * $k + $j] - 2.0 * $dot;
           |    $out[$m * $k + $j] = (long) java.lang.Math.floor($d * 1000000.0 + 0.5);
           |  }
           |}
           |${ev.value} = new $gad($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** cid = argmax over centroids of dot(vector, centroid), earliest index
    * on ties (reference `utils.py:39-44` strict `>`). Replaces the
    * K-unrolled `array_sort(array(struct(dot, cid) x K))` assignment tree —
    * the same codegen-explosion hazard at the DTO's allowed 65,536
    * centroids. Input: array<double> (the l2-normalized vnorm); centroids
    * ship once as a flat reference object.
    */
  case class ArgmaxDot(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression {
    private val k = centroids.length
    private val dim = centroids(0).length

    private lazy val ctFlat: Array[Double] = {
      val out = new Array[Double](k * dim)
      var c = 0
      while (c < k) { System.arraycopy(centroids(c), 0, out, c * dim, dim); c += 1 }
      out
    }

    override def dataType: DataType = IntegerType
    override def nullable: Boolean = child.nullable

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected array<double>, got $dt")
    }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), dim)
      var best = 0; var bestDot = Double.NegativeInfinity
      var c = 0
      while (c < k) {
        val cbase = c * dim
        var dot = 0.0; var t = 0
        while (t < n) { dot += arr.getDouble(t) * ctFlat(cbase + t); t += 1 }
        if (dot > bestDot) { bestDot = dot; best = c }
        c += 1
      }
      best
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ctRef = ctx.addReferenceObj("amCents", ctFlat, "double[]")
      nullSafeCodeGen(ctx, ev, in => {
        val n = ctx.freshName("n"); val c = ctx.freshName("c")
        val t = ctx.freshName("t"); val dot = ctx.freshName("dot")
        val best = ctx.freshName("best"); val bestDot = ctx.freshName("bestDot")
        val cbase = ctx.freshName("cbase")
        s"""
           |int $n = java.lang.Math.min($in.numElements(), $dim);
           |int $best = 0; double $bestDot = Double.NEGATIVE_INFINITY;
           |for (int $c = 0; $c < $k; $c++) {
           |  int $cbase = $c * $dim;
           |  double $dot = 0.0;
           |  for (int $t = 0; $t < $n; $t++) {
           |    $dot += $in.getDouble($t) * $ctRef[$cbase + $t];
           |  }
           |  if ($dot > $bestDot) { $bestDot = $dot; $best = $c; }
           |}
           |${ev.value} = $best;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Top-n centroid ids by (dot desc, centroid_id asc) — the PER-NODE
    * probe-cell ranking the NSW graph build needs (each node's edge
    * candidates come from its `nprobe` nearest coarse cells, not just its
    * assigned one). ArgmaxDot generalized: the same flat-reference-object
    * loop, plus an n-slot insertion (n = nprobe, single digits) instead of
    * a single running max. Ties keep the EARLIEST centroid (insertion
    * displaces only on strict >), so the result order is exactly the
    * oracle's `ORDER BY dot DESC, centroid_id ASC` window.
    */
  case class TopNDotIds(child: Expression, centroids: Array[Array[Double]],
      n: Int) extends UnaryExpression {
    require(n >= 1, s"TopNDotIds needs n >= 1, got $n")
    private val k = centroids.length
    private val dim = centroids(0).length
    private val nn = math.min(n, k)

    private lazy val ctFlat: Array[Double] = {
      val out = new Array[Double](k * dim)
      var c = 0
      while (c < k) { System.arraycopy(centroids(c), 0, out, c * dim, dim); c += 1 }
      out
    }

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = child.nullable

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"expected array<double>, got $dt")
    }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val len = math.min(arr.numElements(), dim)
      val ids = new Array[Int](nn)
      val dots = Array.fill(nn)(Double.NegativeInfinity)
      var c = 0
      while (c < k) {
        val cbase = c * dim
        var dot = 0.0; var t = 0
        while (t < len) { dot += arr.getDouble(t) * ctFlat(cbase + t); t += 1 }
        // insertion by strict >: equal dots keep the earlier centroid
        var pos = nn
        while (pos > 0 && dot > dots(pos - 1)) pos -= 1
        if (pos < nn) {
          var j = nn - 1
          while (j > pos) { dots(j) = dots(j - 1); ids(j) = ids(j - 1); j -= 1 }
          dots(pos) = dot; ids(pos) = c
        }
        c += 1
      }
      new GenericArrayData(ids)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ctRef = ctx.addReferenceObj("tnCents", ctFlat, "double[]")
      val gad = classOf[GenericArrayData].getName
      nullSafeCodeGen(ctx, ev, in => {
        val len = ctx.freshName("len"); val c = ctx.freshName("c")
        val t = ctx.freshName("t"); val dot = ctx.freshName("dot")
        val ids = ctx.freshName("ids"); val dots = ctx.freshName("dots")
        val pos = ctx.freshName("pos"); val j = ctx.freshName("j")
        val cbase = ctx.freshName("cbase")
        s"""
           |int $len = java.lang.Math.min($in.numElements(), $dim);
           |int[] $ids = new int[$nn];
           |double[] $dots = new double[$nn];
           |java.util.Arrays.fill($dots, Double.NEGATIVE_INFINITY);
           |for (int $c = 0; $c < $k; $c++) {
           |  int $cbase = $c * $dim;
           |  double $dot = 0.0;
           |  for (int $t = 0; $t < $len; $t++) {
           |    $dot += $in.getDouble($t) * $ctRef[$cbase + $t];
           |  }
           |  int $pos = $nn;
           |  while ($pos > 0 && $dot > $dots[$pos - 1]) $pos--;
           |  if ($pos < $nn) {
           |    for (int $j = $nn - 1; $j > $pos; $j--) {
           |      $dots[$j] = $dots[$j - 1]; $ids[$j] = $ids[$j - 1];
           |    }
           |    $dots[$pos] = $dot; $ids[$pos] = $c;
           |  }
           |}
           |${ev.value} = new $gad($ids);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def pqEncode(vec: Column, codebook: Array[Array[Array[Float]]]): Column =
    GraftColumnBridge.column(PqEncode(GraftColumnBridge.expression(vec), codebook))

  def adcDtab(res: Column, codebook: Array[Array[Array[Float]]]): Column =
    GraftColumnBridge.column(AdcDtab(GraftColumnBridge.expression(res), codebook))

  def argmaxDot(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.column(ArgmaxDot(GraftColumnBridge.expression(vec), centroids))

  def topNDotIds(vec: Column, centroids: Array[Array[Double]], n: Int): Column =
    GraftColumnBridge.column(
      TopNDotIds(GraftColumnBridge.expression(vec), centroids, n))
}
