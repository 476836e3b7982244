package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |A ∩ B| for two SORTED long arrays as a single merge walk.
  *
  * `array_intersect` builds a per-row hash set (allocation + hashing per
  * element); over millions of candidate pairs in a dedup self-join that
  * dominates the query. The merge walk is allocation-free and runs inside
  * whole-stage codegen. Caller contract: both arrays sorted ascending,
  * distinct elements (array_sort(array_distinct(...)) at build time —
  * sorting is amortized once per ROW, the walk runs once per PAIR).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $i = 0; int $j = 0; int $n = 0;
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $n++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** 60-bit SimHash from an array of 60-bit token hashes: per bit j, count
  * +1/-1 by bit j of each hash; signature bit j set iff the sum is
  * positive. Semantically identical to the HOF formulation
  * (`TextFunctions.simhash60`'s aggregate/zip_with pipeline) but one tight
  * allocation-free loop per row instead of a fresh 60-long array per TOKEN
  * — the HOF version's per-element re-evaluation dominated the dedup
  * suite's signature build.
  */
case class Simhash60FromHashes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"expected array<bigint>, got $dt")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sums = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 60) {
        if (((h >> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) { if (sums(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sums = ctx.freshName("sums"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |int[] $sums = new int[60];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 60; $j++) {
         |    if ((($h >> $j) & 1L) == 1L) { $sums[$j]++; } else { $sums[$j]--; }
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 60; $j++) {
         |  if ($sums[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** All K universal-hash MinHash signatures from an array of 28-bit shingle
  * hashes in one tight loop: sig_j = min over shingles of (h*a_j + b_j) %
  * p. Value-identical to the HOF fold (`TextFunctions.minhashSigsNum`'s
  * aggregate/zip_with pipeline, which allocated two k-arrays per SHINGLE);
  * empty shingle sets yield an array of k nulls (array_min-of-empty
  * parity).
  */
case class MinhashSigsFromHashes(child: Expression, a: Seq[Long], b: Seq[Long],
    p: Long) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private val k = a.length
  require(b.length == k, "a/b constant arrays must match")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"expected array<bigint>, got $dt")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](k))
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a.toArray, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val v = ctx.freshName("v")
      val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
      s"""
         |int $n = $in.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new $gad(new Object[$k]);
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $in.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($h * $aRef[$j] + $bRef[$j]) % ${p}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = new $gad($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** 3-probe bloom membership over a fixed 65536-bit filter: positions are
  * the three 16-bit windows of the 60-bit hash (the `q_bloom_probe`
  * scheme). The bitmap rides as a codegen REFERENCE OBJECT
  * (addReferenceObj), not a plan literal — a typedLit formulation
  * stringifies the 1024-long array into every predicate copy the
  * optimizer propagates (measured: six copies in the q_bloom_join plan
  * text) and pays per-probe element_at machinery; here the generated
  * code indexes a plain long[] and the plan prints a one-token tag.
  */
case class BloomMayContain(child: Expression, bitmap: Array[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bitmap.length == 1024, s"expected 1024 longs, got ${bitmap.length}")
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"expected bigint, got $dt")
  }

  private def test(pos: Int): Boolean =
    ((bitmap(pos >> 6) >>> (pos & 63)) & 1L) == 1L

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[Long]
    test((h & 0xffffL).toInt) && test(((h >> 16) & 0xffffL).toInt) &&
      test(((h >> 32) & 0xffffL).toInt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val bm = ctx.addReferenceObj("bloomBits", bitmap, "long[]")
      val ok = ctx.freshName("ok")
      val s = ctx.freshName("s")
      val p = ctx.freshName("p")
      s"""
         |boolean $ok = true;
         |for (int $s = 0; $s <= 32 && $ok; $s += 16) {
         |  int $p = (int) (($h >>> $s) & 65535L);
         |  $ok = (($bm[$p >> 6] >>> ($p & 63)) & 1L) == 1L;
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object SetExpressions {
  def bloomMayContain(h: Column, bitmap: Array[Long]): Column =
    GraftColumnBridge.column(BloomMayContain(
      GraftColumnBridge.expression(h), bitmap))
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def simhash60FromHashes(hashes: Column): Column =
    GraftColumnBridge.column(Simhash60FromHashes(
      GraftColumnBridge.expression(hashes)))
  def minhashSigs(hashes: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    GraftColumnBridge.column(MinhashSigsFromHashes(
      GraftColumnBridge.expression(hashes), a, b, p))
}
