package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Inspect the d6 inner (pre-materialize) plan and time variants —
  * the checkpointed query hides its compute plan from ExplainAll.
  * args: [sfDir]
  */
object D6Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).count()

    def base = Tables.tblSpread(spark, dir, "embeddings", "vec_id")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("e"))
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.DotProduct.dot_product(a, b)

    def inner(cached: Boolean): org.apache.spark.sql.DataFrame = {
      val bucketed = (0 until 2).foldLeft(SimilarityQueries.plantPerturbed(base)) {
        (df, t) => df.withColumn(s"b$t", SimilarityQueries.bucketOf(col("e"), t))
      }
      val n0 = bucketed.withColumn("n", sqrt(dot(col("e"), col("e"))))
      val normed = if (cached) n0.persist() else n0
      val perTable = (0 until 2).map { t =>
        val a = normed.select(col("vec_id").as("id_a"), col("e").as("ea"),
          col("n").as("na"), col(s"b$t").as("bk"))
        val b = normed.select(col("vec_id").as("id_b"), col("e").as("eb"),
          col("n").as("nb"), col(s"b$t").as("bk"))
        a.join(b, Seq("bk"))
          .filter(col("id_a") < col("id_b"))
          .withColumn("sim",
            round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 4))
          .filter(col("sim") >= 0.7)
          .select(col("id_a"), col("id_b"), col("sim"))
      }
      perTable.reduce(_ unionByName _).groupBy("id_a", "id_b")
        .agg(max("sim").as("sim"))
    }

    Seq(false, true).foreach { cached =>
      val df = inner(cached)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[d6probe] cached=$cached rep$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      val plan = df.queryExecution.executedPlan.toString
      println(s"[d6probe] cached=$cached SMJ=${
        "SortMergeJoin".r.findAllIn(plan).size} BHJ=${
        "BroadcastHashJoin".r.findAllIn(plan).size} Exchanges=${
        "Exchange".r.findAllIn(plan).size} scans=${
        "Scan parquet".r.findAllIn(plan).size} imts=${
        "InMemoryTableScan|TableCacheQueryStage".r.findAllIn(plan).size}")
    }
    spark.stop()
  }
}
