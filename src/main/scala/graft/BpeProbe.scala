package graft

import org.apache.spark.sql.SparkSession

/** BPE trainer scale probe: trains a REAL-vocabulary-depth merge table
  * (default 32k merges — the production tokenizer regime) and prints wall
  * time plus trajectory endpoints, so the incremental trainer's bound is a
  * measured fact rather than a doc claim (round-9 verdict task 7).
  *
  * Usage: runMain graft.BpeProbe <sfDir> [numMerges]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(32768)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the synthetic documents table has a ~31-word vocabulary, which
    // exhausts all merges within ~100 ranks — `wide` stresses the trainer at
    // the REAL regime instead: 100k distinct md5-hex word types (32 chars
    // over a 16-char alphabet — deep pair structure), so all 32k merges run
    val docs =
      if (sfDir == "wide")
        spark.range(0, 100000).selectExpr("md5(cast(id as string)) as text")
      else Tables.documents(spark, sfDir)
    val t0 = System.nanoTime()
    val m = operators.Bpe.train(docs, "text", numMerges = numMerges)
    val sec = (System.nanoTime() - t0) / 1e9
    val last = m.merges.lastOption
      .map(x => s"${x.rank}:(${x.left}|${x.right})=${x.pairCount}")
      .getOrElse("none")
    println(f"BPE_PROBE sf=$sfDir%s requested=$numMerges%d " +
      f"trained=${m.merges.length}%d vocabTypes=${m.memo.size}%d " +
      f"sec=$sec%.2f last=$last%s")
    spark.stop()
  }
}
