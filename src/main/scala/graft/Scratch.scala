package graft

import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    ev.show(3, false)
    val tx = Tables.transactions(spark, "/root/testdata/sf0.001")
    val agg = operators.StockAggregation.aggregate(tx)
    agg.show(5, false)
    agg.explain("formatted")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      println(s"[scratch] $name rows=$n")
    }
    println(s"[scratch] entry rows=${SparkEntry.entry(spark).count()}")
    // probes
    try {
      functions.JsonPathPredicate.compile("@.buys $$ nonsense")
      println("[scratch] PROBE-FAIL bad predicate accepted")
    } catch {
      case e: IllegalArgumentException => println(s"[scratch] probe bad-predicate rejected: ${e.getMessage}")
    }
    val rev = operators.InteractiveQueries.rangeQuery(agg, Some("U000009"), Some("U000004")).count()
    println(s"[scratch] probe reversed-range rows=$rev")
    val emptyKey = operators.InteractiveQueries.keyQuery(agg, "NOPE").count()
    println(s"[scratch] probe missing-key rows=$emptyKey")
    spark.stop()
  }
}
