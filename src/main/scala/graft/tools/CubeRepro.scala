package graft.tools

import org.apache.spark.sql.functions._
import graft._

object CubeRepro {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    def attempt(name: String)(f: => Long): Unit =
      try println(s"[repro] $name OK rows=" + f)
      catch { case e: Throwable => println(s"[repro] $name FAIL ${e.getMessage.take(120)}") }

    val base = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"), col("c_acctbal"))

    attempt("cube_plain") {
      base.cube("n_name", "c_mktsegment").agg(count(lit(1)).as("n")).count()
    }
    attempt("cube_select_coalesce") {
      base.cube("n_name", "c_mktsegment").agg(count(lit(1)).as("n"))
        .select(coalesce(col("n_name"), lit("ALL")), col("n")).count()
    }
    attempt("cube_orderBy") {
      base.cube("n_name", "c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("n_name").count()
    }
    attempt("rollup_same_base") {
      base.rollup("n_name", "c_mktsegment").agg(count(lit(1)).as("n"))
        .select(coalesce(col("n_name"), lit("ALL")), col("n")).count()
    }
    attempt("cube_nojoin") {
      Tables.customer(spark, dir).cube("c_mktsegment").agg(count(lit(1)).as("n"))
        .select(coalesce(col("c_mktsegment"), lit("ALL")), col("n")).count()
    }
    attempt("cube_full_orderBy_strings") {
      base.cube("n_name", "c_mktsegment").agg(count(lit(1)).as("n"))
        .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
          coalesce(col("c_mktsegment"), lit("ALL")).as("segment"), col("n"))
        .orderBy("nation", "segment").count()
    }
    spark.stop()
  }
}
