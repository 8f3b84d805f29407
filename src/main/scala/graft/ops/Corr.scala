package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Session.table

/** Exact-gateable Pearson correlation matrix over lineitem's measures —
  * feature-correlation screening, the step before dropping redundant
  * features from a training set.
  *
  * Exactness: each column quantizes to integer units sized so every moment
  * (Σx, Σx², Σxy, and the n-scaled covariances n·Σxy − Σx·Σy) stays inside
  * Long through sf1 (max |x| ≤ 2·10³, so n·Σxy ≤ ~10^18 at 6M rows); the
  * final correlation is the q154 FP discipline — covN and the two variance
  * terms are EXACT integers, sqrt is correctly rounded in both engines,
  * and the single divide of deterministic doubles is deterministic.
  *
  * Scale shape: ONE aggregation computes all 4+4+6 moments in a single
  * pass (map-side partial agg); the matrix assembly is arithmetic on one
  * row. */
object Corr {

  private val Cols: Seq[(String, Column)] = Seq(
    ("price_h", floor(col("l_extendedprice") / 100.0 + 0.5).cast("long")),
    ("qty", floor(col("l_quantity") + 0.5).cast("long")),
    ("disc_bp", floor(col("l_discount") * 10000.0 + 0.5).cast("long")),
    ("tax_bp", floor(col("l_tax") * 10000.0 + 0.5).cast("long")))

  /** Gate query (q166): the 6 pairwise correlations as e6 values plus
    * their exact integer building blocks. */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val base = table(spark, dir, "lineitem")
      .select(Cols.map { case (n, c) => c.as(n) }: _*)
    val names = Cols.map(_._1)
    val aggs =
      Seq(count(lit(1)).as("n")) ++
      names.map(n => sum(col(n)).as(s"s_$n")) ++
      names.map(n => sum(col(n) * col(n)).as(s"ss_$n")) ++
      (for (i <- names.indices; j <- i + 1 until names.length)
        yield sum(col(names(i)) * col(names(j)))
          .as(s"sp_${names(i)}_${names(j)}"))
    val m = base.agg(aggs.head, aggs.tail: _*)
    val pairRows = (for (i <- names.indices; j <- i + 1 until names.length) yield {
      val (a, b) = (names(i), names(j))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        (col("n") * col(s"sp_${a}_${b}") - col(s"s_$a") * col(s"s_$b")).as("cov_n"),
        (col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")).as("var_a_n"),
        (col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b")).as("var_b_n"))
    })
    m.select(explode(array(pairRows: _*)).as("p"))
      .select(col("p.col_a").as("col_a"), col("p.col_b").as("col_b"),
        col("p.cov_n").as("cov_n"),
        col("p.var_a_n").as("var_a_n"), col("p.var_b_n").as("var_b_n"),
        floor(col("p.cov_n").cast("double") * 1000000.0 /
          (sqrt(col("p.var_a_n").cast("double")) * sqrt(col("p.var_b_n").cast("double")))
          + 0.5).cast("long").as("corr_e6"))
  }
}
