package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-side running count table for the incremental NB demo — the
  * merge contract (associative + commutative addition) is what the unit
  * tests pin down. TEST-ONLY: state here is O(classes × vocab) ON THE
  * DRIVER and each batch collects to it, so the production path is
  * [[EventStreams.nbRunningCounts]], which keeps the same counts in
  * Spark's distributed keyed state store.
  */
final class NbCountStore {
  private val counts = scala.collection.mutable.Map.empty[(String, String), Long]
  def merge(batch: Iterable[((String, String), Long)]): Unit = synchronized {
    batch.foreach { case (k, v) => counts.update(k, counts.getOrElse(k, 0L) + v) }
  }
  def get(lang: String, term: String): Long = synchronized {
    counts.getOrElse((lang, term), 0L)
  }
  def snapshot: Map[(String, String), Long] = synchronized { counts.toMap }
}

object NbCountStore {
  /** `foreachBatch` body merging per-batch (lang, term) counts into the
    * driver-side store — the collect() is the reason this lives in test
    * scope only.
    */
  def merger(store: NbCountStore): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => {
      val counts = batch
        .select(col("lang"), explode(split(col("text"), " ")).as("term"))
        .groupBy("lang", "term").count()
        .collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      store.merge(counts)
    }
}
