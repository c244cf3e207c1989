package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.*`, on by default) re-splits skewed
  * partitions at runtime and is the first line of defense; manual
  * salting remains the tool when the skew sits in an aggregation key
  * or when a deterministic layout is required (e.g. writing a salted
  * intermediate that several downstream jobs share).
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Equi-join where `left`'s `key` is heavily skewed: left rows get a
    * salt in [0, salts); `right` is replicated `salts` times; the join
    * key becomes (key, salt), splitting each hot key's hash partition
    * into `salts` independent ones. Result is row-identical to the
    * plain equi-join — salting only changes the partitioning.
    *
    * Cost model: right side grows ×`salts`, so this is for
    * moderate-size right tables (too big to broadcast, small enough to
    * replicate) against a skewed big left side.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = left.withColumn(
      SaltCol,
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val r = right.withColumn(
      SaltCol,
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Two-phase skewed aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key — the map-side-combine pattern made
    * explicit for sum-like merges when one key dominates the shuffle.
    * `sumCols` are summed; counts merge by summing too.
    */
  def saltedSumAgg(
      df: DataFrame,
      key: String,
      salts: Int,
      sumCols: Seq[String]
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = df.withColumn(
      SaltCol,
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val partial = salted
      .groupBy(col(key), col(SaltCol))
      .agg(
        count(lit(1)).as("__n"),
        sumCols.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    partial
      .groupBy(col(key))
      .agg(
        sum(col("__n")).as("n"),
        sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")): _*)
  }
}
