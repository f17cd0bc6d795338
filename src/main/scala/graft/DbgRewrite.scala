package graft
import org.apache.spark.sql.functions._
object DbgRewrite {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(4)
    import spark.implicits._
    graft.plans.GraftExpressions.register(spark)
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val q = df.select(expr("aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)").as("dot"))
    println("OPT: " + q.queryExecution.optimizedPlan.expressions.map(_.treeString).mkString("\n"))
    println("EXTRA: " + spark.experimental.extraOptimizations)
    spark.stop()
  }
}
