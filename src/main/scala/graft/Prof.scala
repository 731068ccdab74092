package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc profiling harness: `runMain graft.Prof <queryName> [n]` runs a
  * registered query n times warm (noop sink) against SPARK_GRAFT_SF_DIR
  * and prints per-iteration seconds; `runMain graft.Prof explain <name>`
  * prints the formatted physical plan. Developer tool, not a driver
  * contract. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    args.toList match {
      case "explain" :: name :: Nil =>
        println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      // batch plan dump for the plans/<round>/ audit files: one JVM,
      // one formatted plan per file, suffix chosen by the caller
      case "explainAll" :: outDir :: suffix :: names if names.nonEmpty =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        names.foreach { n =>
          val p = SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(outDir, s"$n$suffix.txt"), p)
          println(s"[prof] wrote $outDir/$n$suffix.txt")
        }
      case name :: rest =>
        val n = rest.headOption.map(_.toInt).getOrElse(3)
        val fn = SparkEntry.queries(name)
        (1 to n).foreach { i =>
          spark.catalog.clearCache() // drop internal persists: recompute honestly
          val t0 = System.nanoTime()
          noop(fn(spark, sfDir))
          println(f"[prof] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      case Nil => sys.error("usage: Prof <queryName> [n] | Prof explain <name>")
    }
    spark.stop()
  }
}
