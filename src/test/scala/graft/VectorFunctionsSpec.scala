package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._

/** Kernel equivalence + reference-semantics specs: the fused codegen
  * expressions must be BITWISE equal to the higher-order-function
  * formulation (same sequential double fold), and both must honor the
  * reference's zero-vector rules (`utils.py:10-15,32-37`).
  */
class VectorFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("codegen dot/cosine bitwise-match the HOF formulation on real data") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val cmp = emb.crossJoin(q).select(
      dotProduct(col("embedding"), col("q")).as("dot_gen"),
      dotProductHof(col("embedding"), col("q")).as("dot_hof"),
      cosineSim(col("embedding"), col("q")).as("cos_gen"),
      cosineSimHof(col("embedding"), col("q")).as("cos_hof"))
    val bad = cmp.filter(col("dot_gen") =!= col("dot_hof") ||
      col("cos_gen") =!= col("cos_hof")).count()
    assert(bad == 0)
  }

  test("zero-vector rules: cosine 0.0, normalize null, euclidean sim bounds") {
    val df = spark.sql(
      """SELECT array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)) AS z,
        |       array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)) AS v""".stripMargin)
    val r = df.select(
      cosineSim(col("z"), col("v")).as("c1"),
      cosineSim(col("v"), col("z")).as("c2"),
      cosineSim(col("z"), col("z")).as("c3"),
      l2Normalize(col("z")).as("nz"),
      l2Norm(col("v")).as("nv"),
      euclideanSim(col("v"), col("v")).as("es"),
      dotProduct(col("v"), col("v")).as("dp")).collect().head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    assert(r.isNullAt(3))
    assert(r.getDouble(4) == 5.0)
    assert(r.getDouble(5) == 1.0)
    assert(r.getDouble(6) == 25.0)
  }

  test("null propagation: null vector -> null score") {
    val df = spark.sql(
      "SELECT CAST(NULL AS ARRAY<FLOAT>) AS a, array(CAST(1.0 AS FLOAT)) AS b")
    val r = df.select(cosineSim(col("a"), col("b")),
      dotProduct(col("a"), col("b")), euclideanDist(col("a"), col("b")))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("argmax keeps the earliest max (reference utils.py:39-44)") {
    val r = spark.sql("SELECT 1").select(
      argmaxIdx(typedLit(Seq(1.0, 5.0, 5.0, 2.0)))).collect().head
    assert(r.getInt(0) == 1)
  }

  test("metric dispatch rejects unknown metrics") {
    intercept[IllegalArgumentException] {
      similarity("manhattan")(col("a"), col("b"))
    }
  }

  // ---- round-2 text kernels (codegen vs hand-computed, empty, null) ----

  test("Simhash60FromHashes matches a hand-computed signature; empty -> all-zero-sum bits") {
    import graft.functions.SetExpressions.simhash60FromHashes
    // hashes 0b01 and 0b11: bit0 sums +2 (set), bit1 sums 0 (clear: >0 strict)
    val r = spark.sql("SELECT array(1L, 3L) AS hs, array() AS empty")
      .select(simhash60FromHashes(col("hs")).as("sig"),
        simhash60FromHashes(expr("CAST(empty AS ARRAY<BIGINT>)")).as("esig"),
        simhash60FromHashes(expr("CAST(NULL AS ARRAY<BIGINT>)")).as("nsig"))
      .collect().head
    assert(r.getLong(0) == 1L) // only bit 0 positive
    assert(r.getLong(1) == 0L) // empty: all sums -0 -> no bit set... sums are 0, strict > keeps 0
    assert(r.isNullAt(2))
    // single hash: signature == the hash itself restricted to 60 bits
    val one = spark.sql("SELECT array(123456789L) AS hs")
      .select(simhash60FromHashes(col("hs"))).collect().head.getLong(0)
    assert(one == 123456789L)
  }

  test("MinhashSigsFromHashes equals the per-signature universal-hash min") {
    import graft.functions.TextFunctions.{MinhashAB, MinhashP, minhashSigsNum}
    import graft.functions.SetExpressions.minhashSigs
    val hs = Seq(17L, 9999991L, 123L, 7L)
    val (as, bs) = MinhashAB.take(8).unzip
    val expected = (0 until 8).map(j => hs.map(h => (h * as(j) + bs(j)) % MinhashP).min)
    val got = spark.sql(s"SELECT array(${hs.mkString("L,")}L) AS hs")
      .select(minhashSigs(col("hs"), as, bs, MinhashP).as("sigs"))
      .collect().head.getSeq[Long](0)
    assert(got == expected)
    // empty shingle set -> k nulls (array_min-of-empty parity)
    val empty = spark.sql("SELECT CAST(array() AS ARRAY<BIGINT>) AS hs")
      .select(minhashSigs(col("hs"), as, bs, MinhashP).as("sigs"))
      .collect().head.getSeq[Any](0)
    assert(empty.length == 8 && empty.forall(_ == null))
    // and the full minhashSigsNum pipeline produces the same as a
    // driver-side recomputation over md5 28-bit prefixes
    val sigs = spark.sql("SELECT array('a b c', 'b c d') AS sh")
      .select(minhashSigsNum(col("sh"), 4).as("sigs"))
      .collect().head.getSeq[Long](0)
    def h28(s: String): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(7), 16)
    val exp2 = (0 until 4).map(j =>
      Seq("a b c", "b c d").map(s => (h28(s) * as(j) + bs(j)) % MinhashP).min)
    assert(sigs == exp2)
  }
}
