package graft

import graft.plans.{GraftExtensions, RewriteDotProduct}
import org.apache.spark.sql.functions._

/** Session-extension behavior: the optimizer rewrite fires on the
  * declarative dot-product idiom and preserves results; native
  * functions become SQL-callable.
  */
class ExtensionsSpec extends SparkSpec {

  private def declarativeDot = {
    val e = graft.ops.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.select(
      col("vec_id"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y), lit(0.0), (a, x) => a + x)
        .as("dot"))
  }

  test("RewriteDotProduct rewrites aggregate(zip_with(...)) into the native expression") {
    GraftExtensions.install(spark)
    val plan = declarativeDot.queryExecution.optimizedPlan.toString
    assert(plan.contains("dot_product"), s"rewrite did not fire:\n$plan")
  }

  test("rewrite preserves values bit-for-bit") {
    // clean session state: compute without the rule by removing it
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq.empty
    val unfused = declarativeDot.orderBy("vec_id").collect()
    spark.experimental.extraOptimizations = before :+ RewriteDotProduct
    val fused = declarativeDot.orderBy("vec_id").collect()
    spark.experimental.extraOptimizations = before
    unfused.zip(fused).foreach { case (u, f) =>
      assert(u.getDouble(1) == f.getDouble(1), s"vec ${u.getLong(0)}")
    }
  }

  test("native functions are SQL-callable after install") {
    GraftExtensions.install(spark)
    graft.ops.Tables.documents(spark, Sf).createOrReplaceTempView("docs_ext")
    val row = spark.sql(
      """SELECT simhash64(split(text, ' ')) AS sh,
        |  minhash_signature(split(text, ' '), 8) AS mh,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  decode_byte_array(array(104L, 105L)) AS s
        |FROM docs_ext LIMIT 1""".stripMargin).head()
    assert(row.getSeq[Long](row.fieldIndex("mh")).size == 8)
    assert(row.getAs[Double]("dp") == 11.0)
    assert(row.getAs[String]("s") == "hi")
  }
}
