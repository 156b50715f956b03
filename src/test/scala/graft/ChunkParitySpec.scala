package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** withOrderedChunks must equal the single-partition ntile form it replaced
  * — the streaming oracles replay that ntile in SQL, so any divergence is a
  * correctness break, not a performance detail.
  */
class ChunkParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("withOrderedChunks == ntile over a global orderBy (events, 20 chunks)") {
    val base = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("ts"), col("event_id"))
    val mine = Tables.withOrderedChunks(base, 20, Seq(col("ts"), col("event_id")))
      .select(col("event_id"), col("chunk").as("c_mine"))
    val ref = base.select(col("event_id"),
      (ntile(20).over(Window.orderBy(col("ts"), col("event_id"))) - 1)
        .cast("int").as("c_ref"))
    val diffs = mine.join(ref, Seq("event_id"))
      .filter(col("c_mine") =!= col("c_ref"))
    val sample = diffs.orderBy("event_id").limit(5).collect()
    assert(diffs.count() == 0,
      s"chunk divergence, sample: ${sample.mkString(", ")}")
  }

  test("withOrderedChunks == ntile on a doc_id ordering (documents, 7 chunks)") {
    val base = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"))
    val mine = Tables.withOrderedChunks(base, 7, Seq(col("doc_id")))
      .select(col("doc_id"), col("chunk").as("c_mine"))
    val ref = base.select(col("doc_id"),
      (ntile(7).over(Window.orderBy(col("doc_id"))) - 1).cast("int").as("c_ref"))
    val diffs = mine.join(ref, Seq("doc_id"))
      .filter(col("c_mine") =!= col("c_ref"))
    assert(diffs.count() == 0)
  }
}
