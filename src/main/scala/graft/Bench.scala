package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM (codegen, parquet reader, shuffle machinery) on the
    // tiny SF so the first timed query doesn't absorb ~3s of startup.
    try SparkEntry.entry(spark).queryExecution.toRdd.count()
    catch { case _: Throwable => () }
    // Alphabetical order: stable across rounds, so shared memoized
    // builds (shingle index, parsed PGN corpus) are always charged to
    // the same (first alphabetical) consumer and per-query numbers
    // stay comparable between rounds.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // toRdd.count() materializes every output column of the plan —
      // a plain .count() would let Catalyst prune the computed columns
      // and time only a row count.
      val ok =
        try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case _: Throwable => false }
      // a failed query is recorded as -1, never as a (fast) timing
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // Persist the parsed line so the round total survives sbt log noise.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
