import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object KdDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("kd-debug").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val m = classOf[graft.sim.Lof.type]
    // rebuild the q403 chain inline
    val pts = graft.operators.Spread.widen(
      df.select(col("vec_id").cast("long").as("id"), col("embedding").as("v")), col("id"))
    val seeds = pts.orderBy(col("id")).limit(16)
      .select(col("id").as("sid"), col("v").as("sv"))
    val dSeed = round((lit(1.0) - graft.sim.Similarity.cosine(col("v"), col("sv"))) * lit(1e6)).cast("long")
    val asg = pts.join(broadcast(seeds))
      .select(col("id"), col("v"), struct(dSeed.as("d"), col("sid")).as("ds"))
      .groupBy(col("id")).agg(min(col("ds")).as("m"), first(col("v")).as("v"))
      .select(col("id"), col("m.sid").as("cluster"), col("v"))
    val d12 = round((lit(1.0) - graft.sim.Similarity.cosine(col("a.v"), col("b.v"))) * lit(1e12)).cast("long")
    val pairs = asg.alias("a").join(asg.alias("b"),
        col("a.cluster") === col("b.cluster") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("nb"), d12.as("d"))
    val w = Window.partitionBy(col("id")).orderBy(col("d"), col("nb"))
    val kd = pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 10)
      .select(col("id"), col("d").as("kd"))
    val rk = kd.withColumn("r", row_number().over(Window.orderBy(col("kd"), col("id"))))
    rk.filter(col("r").between(45, 55)).orderBy("r").collect()
      .foreach(r => println(s"rank ${r.getAs[Long]("r")} id ${r.getLong(0)} kd ${r.getLong(1)}"))
    println("n=" + kd.count())
    spark.stop()
  }
}
