package graft

/** Throwaway timing probe for slow bench queries (not part of the API).
  * Runs each named query twice (cold / warm), clearing cache between runs.
  * Usage: SPARK_GRAFT_PROBE=q67_mix_weights,q79_lm_score runMain graft.Probe */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE", "q59_ngram_jaccard")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.builder("graft-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"${dir.stripSuffix("/")}/region.parquet").count()

    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    for (name <- names; pass <- Seq("cold", "warm")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"[probe] $name%-28s $pass%-5s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      clear()
    }
    spark.stop()
  }
}
