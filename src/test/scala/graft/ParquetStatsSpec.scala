package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

import graft.sources.ParquetStats

/** Footer zone-map statistics reader. */
class ParquetStatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def writeSorted(dir: String): Unit = {
    import spark.implicits._
    // 4 range-sorted files → disjoint tight [min,max] per file
    (0L until 4000L).map(i => (i, s"v$i")).toDF("k", "s")
      .repartitionByRange(4, col("k")).sortWithinPartitions(col("k"))
      .write.mode("overwrite").parquet(dir)
  }

  test("footer stats report tight per-file bounds on sorted layout") {
    val dir = Files.createTempDirectory("graft-pstats").toString + "/t"
    writeSorted(dir)
    val st = ParquetStats.footerStats(spark, dir)
      .filter(col("column") === "k").collect()
    assert(st.nonEmpty)
    // every file's [min,max] is a fraction of the 4000-key domain —
    // range-partition boundaries are SAMPLE-estimated, so allow slack
    // (observed 1006 on a nominal 1000 split); an unsorted layout would
    // span ~4000 per file
    st.foreach { r =>
      val mn = r.getString(4).toLong; val mx = r.getString(5).toLong
      assert(mx - mn < 1600L, s"loose bounds [$mn,$mx] in ${r.getString(0)}")
    }
    // row counts in the footer match the data
    assert(st.map(_.getLong(3)).sum == 4000L)
  }

  test("pruning estimate: a narrow range skips most files, full range none") {
    val dir = Files.createTempDirectory("graft-pstats2").toString + "/t"
    writeSorted(dir)
    val (n, skipNarrow) = ParquetStats.pruningEstimate(spark, dir, "k", 100L, 200L)
    assert(n >= 4)
    assert(skipNarrow >= n - 2, s"expected nearly all files skippable, got $skipNarrow/$n")
    val (_, skipAll) = ParquetStats.pruningEstimate(spark, dir, "k", 0L, 4000L)
    assert(skipAll == 0)
  }
}
