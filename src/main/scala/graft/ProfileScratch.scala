package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.mlops.{LinearOps, NaiveBayesOps}

/** Throwaway scratch main for round investigations (untracked). */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val emb = Tables(spark, dir).embeddings
        .withColumn("y", (col("label") % 2).cast("double"))
      val mlPred = LinearOps.fitLogistic(emb, "embedding", "y", maxIter = 100)
        .select(col("vec_id"), col("prediction").as("ml_pred"))
        .localCheckpoint()
      val pts = NaiveBayesOps.toLongForm(emb, Seq("vec_id"), "embedding")
        .localCheckpoint()
      val labels = emb.select(col("vec_id"), col("y")).localCheckpoint()
      for (iters <- Seq(10, 20, 40, 80); lr <- Seq(0.5, 1.0)) {
        val w = LinearOps.logisticGdIterations(pts, labels, "vec_id", "y",
          iters = iters, lr = lr)
        val gdPred = pts.join(broadcast(w), "dim")
          .groupBy(col("vec_id")).agg(sum(col("v") * col("w")).as("m"))
          .withColumn("gd_pred", when(col("m") >= 0, 1.0).otherwise(0.0))
        val r = gdPred.join(mlPred, "vec_id")
          .agg(sum(when(col("gd_pred") === col("ml_pred"), 1).otherwise(0)).as("agree"),
            count(lit(1)).as("n"),
            min(abs(col("m"))).as("min_abs_margin")).collect()(0)
        println(f"[conv] sf=$sf iters=$iters%3d lr=$lr gd==ml ${r.getLong(0)}/${r.getLong(1)} min|m|=${r.getDouble(2)}%.5f")
      }
    }
    spark.stop()
  }
}
