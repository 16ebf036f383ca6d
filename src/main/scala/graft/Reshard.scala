package graft
object Reshard {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("reshard")
    val p = args(0); val n = args(1).toInt
    val df = spark.read.parquet(p)
    val tmp = p + ".reshard"
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    import java.nio.file._
    def rm(d: Path): Unit = { if (Files.isDirectory(d)) Files.list(d).forEach(rm); Files.deleteIfExists(d) }
    rm(Paths.get(p))
    Files.move(Paths.get(tmp), Paths.get(p))
    spark.stop()
  }
}
