package graft.operators

import graft.{SparkSpec, Tables}
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ANN serving ([[StreamingOps.streamingAnnServe]]): the
  * online cell of the vector stack. Pins the two claims the scaladoc
  * makes — per-micro-batch serving is BIT-EQUAL to the batch IVFADC
  * search over the same queries, and a checkpoint restart continues at
  * the next micro-batch with prior outputs untouched. */
class StreamingAnnSpec extends SparkSpec {

  private def resultRows(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "rn", "vec_id", "cos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("streaming serving ≡ batch ivfPqSearch; restart continues, outputs untouched") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark0.sqlContext
    // persisted index over the fixture corpus
    val emb = ProductQuant.normalized(
      Tables.embeddings(spark, sf0001)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))
    val idx = tmpDir("sann-idx")
    ProductQuant.writeIvfPqIndex(spark, idx, emb, c = 4)
    // queries: the first NumQueryVecs index vectors, chopped in two
    val qs = emb.filter(col("vec_id") < Similarity.NumQueryVecs)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val (chop1, chop2) = qs.splitAt(qs.length / 2)
    val out = tmpDir("sann-out")
    val ck = tmpDir("sann-ck")
    val in = MemoryStream[(Long, Seq[Double])]
    val q1 = StreamingOps.streamingAnnServe(
      in.toDF().toDF("q_id", "qv"), idx, out, ck, nProbe = 4)
    try {
      in.addData(chop1.toSeq: _*); q1.processAllAvailable()
    } finally q1.stop()
    assert(Tables.artifactComplete(s"$out/batch=0"))
    val b0Marker = new java.io.File(s"$out/batch=0/_GRAFT_COMPLETE")
    val b0Mtime = b0Marker.lastModified()
    // RESTART from the same checkpoint: only the new chop processes
    val q2 = StreamingOps.streamingAnnServe(
      in.toDF().toDF("q_id", "qv"), idx, out, ck, nProbe = 4)
    try {
      in.addData(chop2.toSeq: _*); q2.processAllAvailable()
    } finally q2.stop()
    assert(b0Marker.lastModified() === b0Mtime,
      "a restarted query must not re-emit completed batches")
    assert(Tables.artifactComplete(s"$out/batch=1"))
    // the union of both batches ≡ the batch search over all queries
    val served = resultRows(
      spark.read.parquet(s"$out/batch=0")
        .union(spark.read.parquet(s"$out/batch=1")))
    val (assigned, cent, cbs) = ProductQuant.readIvfPqIndex(spark, idx)
    val queries = qs.toSeq.toDF("q_id", "qv")
    val reference = resultRows(ProductQuant.ivfPqSearch(
      assigned, assigned.select("vec_id", "v"), queries, cent, cbs,
      nProbe = 4))
    assert(served === reference,
      "streamed micro-batches must reproduce the batch search bit-exactly")
    assert(served.nonEmpty)
  }
}
