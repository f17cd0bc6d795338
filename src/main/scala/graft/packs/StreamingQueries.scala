package graft.packs

import java.nio.file.Files
import java.util.UUID

import graft.QueryPack
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming driver-contract artifacts (SURVEY §2.4 L5 / §2.8 streaming).
  *
  * Each query runs a REAL Structured Streaming job — file source → keyed
  * state store → memory sink — under `Trigger.AvailableNow`, which drains
  * all available input (possibly across several micro-batches) and stops,
  * so the result is deterministic and batch-oracle-checkable. This is the
  * reference's `partial_fit` invariant made executable: the incremental
  * fit must equal the batch fit over the same corpus
  * (`splearn/linear_model/stochastic_gradient.py:~L10`).
  */
object StreamingQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // L5: distributed streaming-NB sufficient statistics, driven as a
    // file stream and reduced to the final state table. Update-mode
    // output emits one row per touched key per micro-batch; counts are
    // monotone, so max(count) per (class, term) == the last update ==
    // the running total once the stream drains. Oracle = plain GROUP BY.
    "l5_streaming_nb_counts" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      // glob, not a bare file path: the file source requires a directory
      // basePath, and a glob's non-wildcard prefix ($dir) provides it
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/documents*.parquet")
      // unique sink + fresh checkpoint per invocation: a reused
      // checkpoint would mark the input processed and yield an empty
      // (non-deterministic) result on re-run
      val sink = s"l5_nb_${UUID.randomUUID().toString.replace("-", "")}"
      val ckpt = Files.createTempDirectory("graft_l5_ckpt").toString
      val q = EventStreams.nbRunningCounts(stream).toDF()
        .writeStream.format("memory").queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(sink)
        .groupBy(col("lang"), col("term"))
        .agg(max(col("count")).as("cnt"))
        .orderBy(col("lang"), col("term"))
    })
  )

  val oracles: Map[String, String] = Map(
    // Spark `split(text, " ")` and DuckDB `string_split(text, ' ')` agree
    // on empty tokens, mirroring the n1 tokenization contract.
    "l5_streaming_nb_counts" ->
      """SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT lang, unnest(string_split(text, ' ')) AS term
        |      FROM documents) t
        |GROUP BY lang, term
        |ORDER BY lang, term""".stripMargin
  )
}
