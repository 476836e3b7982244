package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the deterministic hashed-projection text embedder that
  * the DuckDB oracle cannot state (it replays the same template): the
  * LINEARITY of the bag-of-tokens construction and the exactness of the
  * float32 cast the e2e entry depends on.
  */
class TextEmbedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def embedOne(text: String): Array[Long] = {
    import spark.implicits._
    val out = TextQueries.embedded(Seq((0L, text)).toDF("doc_id", "text"))
      .collect()
    assert(out.length == 1)
    (0 until TextQueries.EDim).map(j =>
      out.head.getLong(out.head.fieldIndex(s"e$j"))).toArray
  }

  test("bag-of-tokens linearity: embed(a ++ b) == embed(a) + embed(b)") {
    val a = "the quick brown fox"
    val b = "jumps over the lazy dog"
    val ea = embedOne(a)
    val eb = embedOne(b)
    val eab = embedOne(a + " " + b)
    assert(eab.toSeq == ea.zip(eb).map { case (x, y) => x + y }.toSeq)
  }

  test("token order does not matter; repetition scales the contribution") {
    val e1 = embedOne("alpha beta")
    val e2 = embedOne("beta alpha")
    assert(e1.toSeq == e2.toSeq)
    val single = embedOne("alpha")
    val triple = embedOne("alpha alpha alpha")
    assert(triple.toSeq == single.map(_ * 3).toSeq)
  }

  test("zero-token docs produce no row; weights span negatives and positives") {
    import spark.implicits._
    val out = TextQueries.embedded(Seq((7L, "   ")).toDF("doc_id", "text"))
    assert(out.count() == 0)
    // a handful of distinct tokens must hit both signs somewhere in the
    // 16 dims — a sign bug (dropping the -128 shift) dies here
    val vals = (0 until 20).flatMap(i => embedOne(s"tok$i"))
    assert(vals.min < 0 && vals.max > 0)
    assert(vals.forall(v => v >= -128 && v <= 127))
  }

  test("per-doc sums stay float32-exact at corpus document lengths") {
    // worst case per dim is |tokens| * 128; the e2e float cast is exact
    // while that stays under 2^24 — assert the sf0.001 corpus obeys the
    // bound with 100x headroom, so the float path cannot silently round
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val maxTok = docs
      .select(max(size(graft.functions.TextFunctions.tokens(col("text")))))
      .collect().head.getInt(0)
    assert(maxTok.toLong * 128L * 100L < (1L << 24),
      s"max doc tokens $maxTok leaves under 100x headroom to 2^24")
  }
}
