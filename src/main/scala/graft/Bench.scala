package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = GraftSession
      .builder(master = Some(s"local[$cpus]"), shufflePartitions = Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
    // Ad-hoc conf overrides for A/B tuning: "k=v;k=v".
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Full materialization via the noop sink — count() would let
    // Catalyst prune final projections out of the measurement.
    // A query that throws must read as a FAILURE in the emitted JSON,
    // not as a fast valid measurement: failed names go to `failed`,
    // their per-query value is -1, and they are excluded from totals.
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def run(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      System.gc() // JMH-style: keep accumulated garbage out of the next measurement
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed += name
          -1.0
      }
    }
    // Pass 1 (untimed): JVM JIT + whole-stage-codegen compilation +
    // shuffle-service warmup. Pass 2: steady-state timing — the number
    // that reflects throughput on a long-lived cluster.
    // Optional comma-separated filter for fast single-query iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val cold = selected.map { case (n, f) => n -> run(n, f) }
    val results = selected.map { case (n, f) => n -> run(n, f) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val coldTotal = cold.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,"failed":$failedJson,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
