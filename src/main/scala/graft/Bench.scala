package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — prints ONE JSON line with per-query steady-state
  * seconds at SPARK_GRAFT_SF_DIR.
  *
  * Each query plan is first executed once against the sf0.001 smoke data:
  * that compiles the generated whole-stage code and warms the JIT with
  * negligible data volume, so the timed run measures data processing rather
  * than first-touch codegen (cold-start dominated the naive numbers — e.g.
  * dd5 7.0 s cold vs 0.69 s steady-state at sf0.1 on local[16]).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq.sorted
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      names.foreach { n =>
        try SparkEntry.queries(n)(spark, warmDir).count()
        catch { case _: Throwable => () }
      }
    val results = names.map { n =>
      val t0 = System.nanoTime()
      try { SparkEntry.queries(n)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      n -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
