package graft

/** Plan dumper for the optimization rounds (not part of the API): writes
  * `.explain("formatted")` output for the named queries to
  * `<dir>/<query>_<suffix>.txt` so plan-shape claims in OPTIMIZATION_r*.md
  * are checkable without running Spark.
  * Usage: SPARK_GRAFT_PLANS=q59_ngram_jaccard,q112_containment_pairs \
  *        SPARK_GRAFT_PLANS_DIR=plans/r13 SPARK_GRAFT_PLANS_SUFFIX=after \
  *        runMain graft.Plans */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r13")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLANS_SUFFIX", "after")
    val names = sys.env.getOrElse("SPARK_GRAFT_PLANS", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.builder("graft-plans").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plans] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, dir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
              txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            println(s"[plans] wrote $outDir/${name}_$suffix.txt")
          } catch { case e: Exception =>
            System.err.println(s"[plans] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
