package graft

import graft.operators.Packing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing: bucketed two-phase prefix sum == the naive global
  * window at several bucket shifts, plus the packing invariants (chunk
  * fullness, per-doc coverage, contiguity of slices).
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = spark.range(200).select(
    col("id").as("doc_id"),
    // token counts 1..40 with repeats and seqLen-straddling sizes
    (pmod(col("id") * 7 + 3, lit(40)) + 1).as("tokens"))

  test("two-phase prefix sum == naive window at three bucket shifts") {
    val d = fixture
    // naive reference: one global running-total window
    val h = graft.functions.GraftFunctions
      .md5Long(col("doc_id").cast("string"), 15)
    val w = Window.orderBy(col("_h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = d.withColumn("_h", h)
      .withColumn("_start", sum(col("tokens")).over(w) - col("tokens"))
      .select(col("doc_id"), col("_start"))
      .as[(Long, Long)].collect().toMap
    for (shift <- Seq(40, 50, 59)) {
      val spans = Packing.packSequences(d, "doc_id", "tokens",
        seqLen = 16L, bucketShift = shift)
      val starts = spans.where(col("tok_from") === 0L)
        .select(col("doc_id"),
          col("chunk_id") * 16L + lit(0L)) // head chunk start
        .as[(Long, Long)].collect().toMap
      // head-slice start chunk must equal naive start div 16 per doc
      naive.foreach { case (id, st) =>
        assert(starts(id) == (st / 16L) * 16L,
          s"shift=$shift doc=$id start=$st got=${starts(id)}")
      }
      // full equality of the span table against shift=46 default
      val base = Packing.packSequences(d, "doc_id", "tokens", 16L)
        .collect().toSet
      assert(spans.collect().toSet == base, s"shift=$shift span drift")
    }
  }

  test("shuffleOrder: bijection onto 0..n-1, equals the naive rank, " +
    "invariant across bucket shifts") {
    val d = fixture.select(col("doc_id"))
    val h = graft.functions.GraftFunctions
      .md5Long(col("doc_id").cast("string"), 15)
    val naive = d.withColumn("_h", h)
      .withColumn("_r", row_number().over(
        Window.orderBy(col("_h"), col("doc_id"))) - 1)
      .select(col("doc_id"), col("_r").cast("long"))
      .as[(Long, Long)].collect().toMap
    for (shift <- Seq(40, 50, 59)) {
      val got = Packing.shuffleOrder(d, "doc_id", bucketShift = shift)
        .select(col("doc_id"), col("shuffle_pos"))
        .as[(Long, Long)].collect().toMap
      assert(got === naive, s"shift=$shift rank drift")
      assert(got.values.toSeq.sorted === (0L until 200L),
        s"shift=$shift not a bijection onto 0..n-1")
    }
  }

  test("packing invariants: chunk fullness, coverage, contiguity") {
    val d = fixture
    val spans = Packing.packSequences(d, "doc_id", "tokens", seqLen = 16L)
    val rep = Packing.chunkReport(spans).orderBy(col("chunk_id")).collect()
    val total = d.agg(sum("tokens")).head().getLong(0)
    // every chunk but the last holds exactly seqLen tokens; ids dense
    rep.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("chunk_id") == i.toLong)
      val nt = r.getAs[Long]("n_tokens")
      if (i < rep.length - 1) assert(nt == 16L, s"chunk $i: $nt")
      else assert(nt == total - 16L * (rep.length - 1))
    }
    // per-doc slices cover [0, tokens) contiguously
    val byDoc = spans.orderBy(col("doc_id"), col("chunk_id"))
      .select("doc_id", "tok_from", "tok_to")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val toks = d.as[(Long, Long)].collect().toMap
    byDoc.foreach { case (id, sl) =>
      assert(sl.head._2 == 0L && sl.last._3 == toks(id))
      sl.sliding(2).foreach {
        case Array(a, b) => assert(a._3 == b._2, s"doc $id gap")
        case _ =>
      }
    }
  }
}
