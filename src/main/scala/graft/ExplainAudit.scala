package graft
import org.apache.spark.sql.functions._
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8, 8)
    val docs = graft.core.Synth.docs(spark, 1000)
    val t = graft.operators.Splitter(
      graft.operators.Crop.box2d(docs, 635500, 848500, 638500, 853500),
      1000.0, origin = Some((635000.0, 848000.0)))
    println(t.groupBy("tile_id").count().queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
