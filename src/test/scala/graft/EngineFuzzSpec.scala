package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine._
import graft.engine.EngineErrors._

/** Differential fuzz: a seeded random sequence of engine verbs replayed
  * against a tiny in-memory model that implements the REFERENCE semantics
  * directly (dict-of-chunks, last-write-wins upserts, cascade deletes,
  * silent chunk delete, exact cosine top-k with post-filters). After every
  * mutation the snapshot state must equal the model; searches must agree
  * on ids AND scores. This is the CRUD/search analog of the DuckDB oracle:
  * two independent implementations forced to agree on a long random walk.
  *
  * The walks are split across FOUR sibling suites (this class plus the
  * EngineFuzzIndexed{A,B,C}Spec classes below) so build.sbt's forked
  * test groups can run them in parallel JVMs — the walks are fully
  * independent (own engine root, own seed), and one 20-minute monolithic
  * suite was the unit run's critical path (optimization r16, VERDICT r15
  * item 3: make `sbt test` fit the harness budget).
  */
abstract class EngineFuzzWalks extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val fixedClock = () => Timestamp.valueOf("2026-01-01 00:00:00")

  case class MChunk(id: String, docId: String, text: String,
      emb: Option[Array[Float]], author: Option[String], version: Long)

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  protected def crudWalkSingleLib(): Unit = {
    val rnd = new Random(42)
    val dim = 4
    val eng = new VectorEngine(spark,
      graft.TempDirs.scratch("graft-fuzz").toString, fixedClock)
    val lib = eng.createLibrary("fuzz", dim)
    val docs = (0 until 3).map(i => eng.createDocument(lib, id = Some(s"doc$i")))

    // the model: reference semantics in a few lines of driver Scala
    val model = mutable.LinkedHashMap.empty[String, MChunk]

    def randVec(): Option[Array[Float]] =
      if (rnd.nextInt(5) == 0) None
      else Some(Array.fill(dim)((rnd.nextInt(19) - 9) / 3.0f))

    var step = 0
    while (step < 200) {
      rnd.nextInt(10) match {
        case n if n <= 5 => // upsert batch of 1-3 (possibly duplicate ids)
          val doc = docs(rnd.nextInt(docs.length))
          val batch = (0 until 1 + rnd.nextInt(3)).map { _ =>
            val id = s"c${rnd.nextInt(40)}"
            ChunkIn(s"text-$step-$id", randVec(), id = Some(id),
              author = Some(s"a${rnd.nextInt(3)}"))
          }
          eng.upsertChunks(lib, doc, batch)
          // dict semantics: duplicates within a batch collapse last-wins
          // BEFORE the store sees them (one version bump per batch)
          val collapsed = mutable.LinkedHashMap.empty[String, ChunkIn]
          batch.foreach(c => collapsed.put(c.id.get, c))
          collapsed.foreach { case (id, c) =>
            val prev = model.get(id)
            model(id) = MChunk(id, doc, c.text, c.embedding, c.author,
              prev.map(_.version + 1).getOrElse(1L))
          }
        case 6 => // delete one chunk (maybe missing -> silent)
          val id = s"c${rnd.nextInt(40)}"
          eng.deleteChunk(lib, id)
          model.remove(id)
        case 7 => // cascade-delete and recreate a document
          val doc = docs(rnd.nextInt(docs.length))
          eng.deleteDocument(lib, doc)
          model.filterInPlace((_, c) => c.docId != doc)
          eng.createDocument(lib, id = Some(doc))
        case _ => // search and compare against the model's exact top-k
          val q = Array.fill(dim)((rnd.nextInt(19) - 9) / 3.0f)
          val k = 1 + rnd.nextInt(6)
          val author = if (rnd.nextBoolean()) Some(s"a${rnd.nextInt(3)}") else None
          val got = eng.search(lib, q, k,
              filters = author.map(a => SearchFilters(author = Some(a))))
            .collect().map(r => (r.getString(0), r.getDouble(2)))
          val topk = model.values.toSeq.filter(_.emb.isDefined)
            .map(c => (c.id, cos(c.emb.get, q)))
            .sortBy { case (id, s) => (-s, id) }.take(k)
          val expected = author.fold(topk) { a => // post-filter AFTER top-k
            val ok = model.values.filter(_.author.contains(a)).map(_.id).toSet
            topk.filter(t => ok.contains(t._1))
          }
          assert(got.map(_._1).toSeq == expected.map(_._1),
            s"step $step: ids diverged (k=$k author=$author)")
          got.zip(expected).foreach { case ((_, gs), (_, es)) =>
            assert(math.abs(gs - es) < 1e-9, s"step $step: score diverged")
          }
          // periodically: the BATCH path must give the model's answer
          // under the same churn (same filters, same top-k contract)
          if (step % 40 == 8) {
            val viaBatch = eng.searchBatchAnn(lib, Seq(0L -> q), k,
                filters = author.map(a => SearchFilters(author = Some(a))))
              .collect().map(r => (r.getString(1), r.getDouble(3)))
            assert(viaBatch.map(_._1).toSeq == expected.map(_._1),
              s"step $step: batch ids diverged (k=$k author=$author)")
          }
      }
      step += 1
    }

    // final state equivalence: ids, text, version
    val stateRows = eng.chunks.collect().map { r =>
      (r.getString(r.fieldIndex("id")), r.getString(r.fieldIndex("text")),
        r.getLong(r.fieldIndex("version")))
    }.sortBy(_._1)
    val modelRows = model.values.toSeq.map(c => (c.id, c.text, c.version)).sortBy(_._1)
    assert(stateRows.toSeq == modelRows, "final snapshot state diverged")
  }

  /** Second walk: TWO libraries with document moves and library deletes —
    * the partition-selective verbs (writeLibraryPartition + hardlink
    * forwarding + dropLibraryPartition) under 200 steps of churn, checked
    * against the same kind of driver-side model. Chunk id spaces are
    * disjoint per document so id -> document is unambiguous in the model.
    */
  /** Quirk-Q1 scoring for the indexed families: float-normalized stored
    * vector x RAW query — the model-side mirror of the engine's rerank.
    */
  private def cosQ1(v: Array[Float], q: Array[Float]): Double = {
    val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    cos(v.map(x => (x / n).toFloat), q)
  }

  /** Third walk: an IVFPQ library under churn with a FULL-COVERAGE
    * config — every cell probed (nprobe = numCentroids), candidate cap
    * (6k) >= the 30-id space, codewords >= the corpus — so the
    * approximate machinery has no room to drop a true neighbor: the
    * incremental encode on upsert, the anti-join removal on delete, and
    * mid-churn rebuilds must keep `search` EXACTLY equal to the model's
    * quirk-Q1 top-k at every step.
    */
  protected def ivfpqWalk(): Unit =
    indexedWalk("ivfpq", IndexConfig("ivfpq",
      ivfNumCentroids = 2, ivfNprobe = 2, pqSubspaces = 2, pqCodewords = 64),
      seed0 = 13, tag = "graft-fuzz3")

  /** Fourth walk: the same full-coverage churn against an IVF+SQ8
    * library — nprobe = numCentroids and cap 6k >= the id space admit
    * every live code into the exact rerank, so byte-quantization loss
    * cannot reorder the output and `search` must equal the model's
    * quirk-Q1 top-k exactly; a missed incremental encode or an
    * unremoved code row would drop/inject a candidate and diverge.
    */
  protected def ivfsq8Walk(): Unit =
    indexedWalk("ivfsq8",
      IndexConfig("ivfsq8", ivfNumCentroids = 2, ivfNprobe = 2),
      seed0 = 29, tag = "graft-fuzz4")

  /** Fifth/sixth walks: SQ8 (cap >= id space admits every code into the
    * exact rerank) and flat PQ (64 codewords >= the 30-id corpus =
    * exact reconstruction) under the same churn — every compressed
    * family's incremental add/remove path is now fuzz-proven exact.
    */
  protected def sq8Walk(): Unit =
    indexedWalk("sq8", IndexConfig("sq8"), seed0 = 31, tag = "graft-fuzz5")

  /** NSW walk under churn with a FULL-COVERAGE config: one seed cell
    * (the whole corpus) and a beam wider than the id space put every
    * live node into beam0, so the graph machinery has no room to drop a
    * true neighbor — the incremental edge build on upsert, the
    * src/dst-anti-join removal on delete, and the posting maintenance
    * must keep `search` exactly equal to the model's quirk-Q1 top-k at
    * every step (and the periodic batch check runs the per-query walk).
    */
  protected def nswWalk(): Unit =
    indexedWalk("nsw", IndexConfig("nsw_det", ivfNumCentroids = 1,
      ivfNprobe = 1, nswBeam = 64, nswRounds = 1),
      seed0 = 37, tag = "graft-fuzz-nsw")

  /** The LAYERED walk under churn: 150 random mutations against an hnsw
    * library exercise the per-layer delta links / every-layer strips AND
    * the r15 per-library index caches (entry node, layer list, family
    * resolution) — every mutation must invalidate them, or a search
    * after a delete would descend from a dead entry node. Beam 64 over
    * the 30-id space makes the walk exhaustive, so search must equal
    * the model's Q1 top-k exactly at every step.
    */
  protected def hnswWalk(): Unit =
    indexedWalk("hnsw", IndexConfig("hnsw_det", ivfNumCentroids = 1,
      ivfNprobe = 1, nswBeam = 64, nswRounds = 1),
      seed0 = 41, tag = "graft-fuzz-hnsw")

  /** Binary quantization under churn: cap 60 over the 30-id space makes
    * the hamming candidate stage full-coverage, so the stateless encode
    * + exact rerank must equal the model's Q1 top-k at every step.
    */
  protected def bqWalk(): Unit =
    indexedWalk("bq", IndexConfig("bq"), seed0 = 43, tag = "graft-fuzz-bq")

  /** Cell-pruned binary codes under churn with the FULL-COVERAGE config
    * (one cell, nprobe 1 — the nsw discipline): frozen-cell incremental
    * assignment + stateless packing + deletes must keep search equal to
    * the model's Q1 top-k at every step.
    */
  protected def ivfbqWalk(): Unit =
    indexedWalk("ivfbq", IndexConfig("ivfbq", ivfNumCentroids = 1,
      ivfNprobe = 1), seed0 = 47, tag = "graft-fuzz-ivfbq")

  protected def pqWalk(): Unit =
    indexedWalk("pq",
      IndexConfig("pq", pqSubspaces = 2, pqCodewords = 64),
      seed0 = 37, tag = "graft-fuzz6")

  private def indexedWalk(label: String, config: IndexConfig,
      seed0: Int, tag: String): Unit = {
    val rnd = new Random(seed0)
    val dim = 4
    val eng = new VectorEngine(spark,
      graft.TempDirs.scratch(tag).toString, fixedClock)
    val lib = eng.createLibrary(s"fuzz-$label", dim, config)
    val docs3 = (0 until 2).map(i => eng.createDocument(lib, id = Some(s"doc$i")))
    val model = mutable.LinkedHashMap.empty[String, MChunk]

    def randVec(): Option[Array[Float]] =
      if (rnd.nextInt(6) == 0) None
      else Some(Array.fill(dim)((rnd.nextInt(19) - 9) / 3.0f))
    def putModel(doc: String, batch: Seq[ChunkIn]): Unit = {
      val collapsed = mutable.LinkedHashMap.empty[String, ChunkIn]
      batch.foreach(c => collapsed.put(c.id.get, c))
      collapsed.foreach { case (id, c) =>
        val prev = model.get(id)
        model(id) = MChunk(id, doc, c.text, c.embedding, c.author,
          prev.map(_.version + 1).getOrElse(1L))
      }
    }

    // seed + first build so every later search takes the indexed path
    val seed = (0 until 12).map { _ =>
      val id = s"c${rnd.nextInt(30)}"
      ChunkIn(s"seed-$id", randVec(), id = Some(id))
    }
    eng.upsertChunks(lib, docs3(0), seed)
    putModel(docs3(0), seed)
    eng.rebuildIndex(lib)

    var step = 0
    while (step < 150) {
      rnd.nextInt(10) match {
        case n if n <= 4 => // upsert 1-3 (insert, update, or both)
          val doc = docs3(rnd.nextInt(docs3.length))
          val batch = (0 until 1 + rnd.nextInt(3)).map { _ =>
            val id = s"c${rnd.nextInt(30)}"
            ChunkIn(s"text-$step-$id", randVec(), id = Some(id))
          }
          eng.upsertChunks(lib, doc, batch)
          putModel(doc, batch)
        case 5 => // silent delete
          val id = s"c${rnd.nextInt(30)}"
          eng.deleteChunk(lib, id)
          model.remove(id)
        case 6 => // mid-churn rebuild (fresh cells + codebooks)
          eng.rebuildIndex(lib)
        case _ => // search must equal the model's Q1 top-k exactly
          val q = Array.fill(dim)((rnd.nextInt(19) - 9) / 3.0f)
          if (!q.forall(_ == 0f)) {
            val k = 5 + rnd.nextInt(2) // cap 6k >= 30-id space
            val got = eng.search(lib, q, k).collect()
              .map(r => (r.getString(0), r.getDouble(2)))
            val expected = model.values.toSeq
              .filter(_.emb.exists(_.exists(_ != 0f)))
              .map(c => (c.id, cosQ1(c.emb.get, q)))
              .sortBy { case (id, s) => (-s, id) }.take(k)
            assert(got.map(_._1).toSeq == expected.map(_._1),
              s"step $step: $label ids diverged (k=$k)")
            got.zip(expected).foreach { case ((_, gs), (_, es)) =>
              assert(math.abs(gs - es) < 1e-9, s"step $step: score diverged")
            }
          }
      }
      step += 1
    }
  }

  protected def crudWalkTwoLibs(): Unit = {
    val rnd = new Random(7)
    val dim = 4
    val eng = new VectorEngine(spark,
      graft.TempDirs.scratch("graft-fuzz2").toString, fixedClock)
    val libA = eng.createLibrary("fuzzA", dim, id = Some("fuzz-A"))
    var libB = eng.createLibrary("fuzzB", dim, id = Some("fuzz-B"))
    val docIds = (0 until 4).map(i => s"doc$i")
    docIds.foreach(d => eng.createDocument(libA, id = Some(d)))

    val model = mutable.LinkedHashMap.empty[String, MChunk]
    val home = mutable.Map(docIds.map(_ -> libA): _*)

    def randVec(): Option[Array[Float]] =
      if (rnd.nextInt(5) == 0) None
      else Some(Array.fill(dim)((rnd.nextInt(19) - 9) / 3.0f))

    var step = 0
    while (step < 200) {
      rnd.nextInt(12) match {
        case n if n <= 4 => // upsert into a doc currently homed in A
          val homed = docIds.filter(home(_) == libA)
          if (homed.nonEmpty) {
            val doc = homed(rnd.nextInt(homed.length))
            val batch = (0 until 1 + rnd.nextInt(3)).map { _ =>
              val id = s"$doc-c${rnd.nextInt(10)}"
              ChunkIn(s"text-$step-$id", randVec(), id = Some(id),
                author = Some(s"a${rnd.nextInt(3)}"))
            }
            eng.upsertChunks(libA, doc, batch)
            val collapsed = mutable.LinkedHashMap.empty[String, ChunkIn]
            batch.foreach(c => collapsed.put(c.id.get, c))
            collapsed.foreach { case (id, c) =>
              val prev = model.get(id)
              model(id) = MChunk(id, doc, c.text, c.embedding, c.author,
                prev.map(_.version + 1).getOrElse(1L))
            }
          }
        case 5 => // silent single-chunk delete (only affects A-homed rows)
          val doc = docIds(rnd.nextInt(docIds.length))
          val id = s"$doc-c${rnd.nextInt(10)}"
          eng.deleteChunk(libA, id)
          if (home(doc) == libA) model.remove(id)
        case 6 => // move a document A->B or back B->A
          val doc = docIds(rnd.nextInt(docIds.length))
          if (home(doc) == libA) {
            eng.moveDocument(doc, libA, libB)
            home(doc) = libB
          } else {
            eng.moveDocument(doc, libB, libA)
            home(doc) = libA
          }
        case 7 => // drop library B wholesale; its docs are recreated in A
          val victims = docIds.filter(home(_) == libB)
          eng.deleteLibrary(libB)
          model.filterInPlace((_, c) => home(c.docId) != libB)
          victims.foreach { d =>
            eng.createDocument(libA, id = Some(d))
            home(d) = libA
          }
          libB = eng.createLibrary("fuzzB", dim, id = Some(s"fuzz-B$step"))
        case _ => // search library A; model = chunks of A-homed docs
          val q = Array.fill(dim)((rnd.nextInt(19) - 9) / 3.0f)
          val k = 1 + rnd.nextInt(6)
          val got = eng.search(libA, q, k)
            .collect().map(r => (r.getString(0), r.getDouble(2)))
          val expected = model.values.toSeq
            .filter(c => home(c.docId) == libA && c.emb.isDefined)
            .map(c => (c.id, cos(c.emb.get, q)))
            .sortBy { case (id, s) => (-s, id) }.take(k)
          assert(got.map(_._1).toSeq == expected.map(_._1),
            s"step $step: ids diverged (k=$k)")
          got.zip(expected).foreach { case ((_, gs), (_, es)) =>
            assert(math.abs(gs - es) < 1e-9, s"step $step: score diverged")
          }
      }
      step += 1
    }

    // final state: every chunk in the right library with the right content
    val stateRows = eng.chunks.collect().map { r =>
      (r.getString(r.fieldIndex("id")),
        r.getString(r.fieldIndex("library_id")),
        r.getString(r.fieldIndex("text")),
        r.getLong(r.fieldIndex("version")))
    }.sortBy(_._1)
    val modelRows = model.values.toSeq
      .map(c => (c.id, home(c.docId), c.text, c.version)).sortBy(_._1)
    assert(stateRows.toSeq == modelRows, "final two-library state diverged")
  }
}

/** CRUD/search walks (flat scoring path + partition-selective verbs). */
class EngineFuzzSpec extends EngineFuzzWalks {
  test("200 random verbs: engine state and search match the reference model (seed 42)") {
    crudWalkSingleLib()
  }
  test("200 random verbs across two libraries: moves and library deletes (seed 7)") {
    crudWalkTwoLibs()
  }
}

/** Compressed-family walks (ivfpq / ivfsq8 / sq8). */
class EngineFuzzIndexedASpec extends EngineFuzzWalks {
  test("150 random verbs against an IVFPQ library: incremental maintenance stays exact (seed 13)") {
    ivfpqWalk()
  }
  test("150 random verbs against an IVF+SQ8 library: incremental maintenance stays exact (seed 29)") {
    ivfsq8Walk()
  }
  test("150 random verbs against an SQ8 library: incremental maintenance stays exact (seed 31)") {
    sq8Walk()
  }
}

/** Graph-family walks (nsw / hnsw). */
class EngineFuzzIndexedBSpec extends EngineFuzzWalks {
  test("150 random verbs against an NSW library: incremental maintenance stays exact (seed 37)") {
    nswWalk()
  }
  test("150 random verbs against an HNSW library: incremental maintenance stays exact (seed 41)") {
    hnswWalk()
  }
}

/** Binary/PQ-family walks (bq / ivfbq / pq). */
class EngineFuzzIndexedCSpec extends EngineFuzzWalks {
  test("150 random verbs against a BQ library: incremental maintenance stays exact (seed 43)") {
    bqWalk()
  }
  test("150 random verbs against an IVF+BQ library: incremental maintenance stays exact (seed 47)") {
    ivfbqWalk()
  }
  test("150 random verbs against a PQ library: incremental maintenance stays exact (seed 37)") {
    pqWalk()
  }
}
