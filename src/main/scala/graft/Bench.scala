package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the library session: GraftExtensions (custom strategies + native
    // expressions) and the scale-tuned defaults, same as Verify
    val spark = GraftSession.builder("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated subset for local iteration; driver runs all
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // warmup actions so the first measured query doesn't absorb session
    // startup: one count (scheduler/scan paths) plus one small noop write
    // through the vectorized parquet reader and the noop sink commit path
    spark.read.parquet(s"${sfDir.stripSuffix("/")}/region.parquet").count()
    spark.read.parquet(s"${sfDir.stripSuffix("/")}/lineitem.parquet")
      .limit(1000).write.mode("overwrite").format("noop").save()
    // noop-format write: materializes EVERY result row through the full
    // plan (count() lets Catalyst elide final sorts and column projects);
    // a crashed query is reported as a failure, never as a fast time.
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // Drop cache the query leaked (persisted similarity working sets,
      // iteration localCheckpoints): queries are independent programs, and
      // accumulated blocks from 60 of them in one JVM turn the tail of the
      // run into a GC benchmark (observed 3× run-order-dependent swings on
      // the same query). Cleanup time is excluded — a real deployment runs
      // one query per session.
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // ContextCleaner only reclaims dead shuffle files / broadcast blocks
      // when the JVM GC notices the dead references; with a large heap the
      // GC may not run across 100+ back-to-back queries, so the debt of every
      // prior query (tens of GB of shuffle spill, broadcast blocks, codegen
      // classes) lands on whichever query happens to trigger collection —
      // observed as 3-5× inflation of individually-fast queries late in the
      // run. An explicit GC per boundary keeps queries independent; it runs
      // OUTSIDE the timed window.
      System.gc()
      (name, dt, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failures = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failures,"sf":"$sfDir"}"""
    println(line)
    // ALSO archive the complete JSON to a file: the driver's BENCH_r{N}
    // artifact stores only a bounded tail of stdout, which truncated the
    // per-query map in past rounds (q01–q38 timings lost). The file is
    // the full record; overridable for local iteration runs.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    spark.stop()
  }
}
