package graft.mine

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** M1 as a typed `Aggregator[String, DrainTree, Seq[EventTemplate]]`
  * (SURVEY.md §7.3's "custom Aggregator" surface) — usable anywhere the
  * Dataset aggregation API is: `lines.select(DrainAggregator(config)
  * .toColumn)`, inside `groupByKey(...).agg(...)` for per-key mining, or
  * as a building block for SQL-registered aggregation.
  *
  * Semantics are the parallel mode of [[TemplateMining]]: each partition
  * feeds its buffer tree in encounter order, buffers merge pairwise via
  * weight-preserving template replay. Cluster ids in the merged output are
  * synthetic; (template, size) mass is the stable surface (golden and
  * property specs bound the divergence from exact sequential mining).
  *
  * The buffer is Java-serialized between stages — kilobytes per partition
  * (O(#clusters), never O(lines)), so the shuffle cost is independent of
  * corpus size.
  */
case class DrainAggregator(config: DrainConfig = DrainConfig())
    extends Aggregator[String, DrainTree, Seq[EventTemplate]] {

  override def zero: DrainTree = config.newTree()

  override def reduce(tree: DrainTree, line: String): DrainTree = {
    tree.addLogMessage(if (line == null) "" else line)
    tree
  }

  override def merge(a: DrainTree, b: DrainTree): DrainTree = a.merge(b)

  override def finish(tree: DrainTree): Seq[EventTemplate] = tree.clusters

  override def bufferEncoder: Encoder[DrainTree] = Encoders.javaSerialization[DrainTree]

  override def outputEncoder: Encoder[Seq[EventTemplate]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[EventTemplate]]()
}
