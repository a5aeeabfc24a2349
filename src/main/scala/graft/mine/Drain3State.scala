package graft.mine

/** Reader for the reference's persisted Drain3 state file
  * (`drain3_state.bin`, written by `FilePersistence` —
  * `process_logs_v10.py:39,120`): base64 over zlib over a jsonpickle
  * dump of the `drain3.drain.Drain` object. The migration surface for a
  * user resuming from the reference's own persisted state: [[read]] →
  * [[Drain3Snapshot.newTree]] yields a [[DrainTree]] that continues
  * mining exactly where the reference left off.
  *
  * Only PUBLIC jsonpickle/drain3 structure is assumed (observable in the
  * file itself): `py/state.id_to_cluster["json://<id>"].py/state.py/tuple
  * [1] = {log_template_tokens: {py/tuple: [...]}, cluster_id, size}` plus
  * the flat config fields. Tolerates the two LogCluster picklings seen
  * across drain3 versions (attrs `py/tuple` state vs plain dict).
  * JSON parsing via Jackson (already on Spark's classpath).
  */
object Drain3State {

  /** Everything needed to resume: library config + mined clusters
    * (ascending id) + the id counter. */
  case class Drain3Snapshot(
      depth: Int, simTh: Double, maxChildren: Int, maxClusters: Int,
      paramStr: String, parametrizeNumericTokens: Boolean,
      clustersCounter: Long, clusters: Seq[EventTemplate]) {

    /** A live tree with this snapshot's config and clusters restored
      * verbatim (id order = original creation order, so `maxChildren`
      * overflow funnels identically to the original run). */
    def newTree(): DrainTree = {
      val t = new DrainTree(depth = depth, simTh = simTh,
        maxChildren = maxChildren, maxClusters = maxClusters,
        paramStr = paramStr, parametrizeNumericTokens = parametrizeNumericTokens)
      clusters.foreach(t.restore)
      t
    }
  }

  def read(path: String): Drain3Snapshot =
    readBytes(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  def readBytes(raw: Array[Byte]): Drain3Snapshot = {
    // MIME decoder tolerates line breaks a text-mode writer may add
    val compressed = java.util.Base64.getMimeDecoder.decode(raw)
    val json = inflate(compressed)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    val st = Option(root.get("py/state")).getOrElse(
      sys.error("not a jsonpickle Drain dump: missing py/state"))
    def intF(name: String, dflt: Int): Int =
      Option(st.get(name)).filterNot(_.isNull).map(_.asInt).getOrElse(dflt)
    val clusters = scala.collection.mutable.ArrayBuffer.empty[EventTemplate]
    val idc = st.get("id_to_cluster")
    if (idc != null) {
      val it = idc.fields()
      while (it.hasNext) {
        val e = it.next()
        var body = e.getValue
        // unwrap jsonpickle object envelope(s)
        if (body.has("py/state")) body = body.get("py/state")
        if (body.has("py/tuple")) { // attrs __getstate__: [slots?, dict]
          val tup = body.get("py/tuple")
          body = (0 until tup.size).map(tup.get)
            .find(n => n != null && n.has("log_template_tokens"))
            .getOrElse(sys.error(s"no LogCluster dict in ${e.getKey}"))
        }
        val toksNode = {
          val t = body.get("log_template_tokens")
          if (t.has("py/tuple")) t.get("py/tuple") else t
        }
        val toks = (0 until toksNode.size).map(i => toksNode.get(i).asText)
        clusters += EventTemplate(
          body.get("cluster_id").asLong,
          body.get("size").asLong,
          toks.mkString(" "))
      }
    }
    Drain3Snapshot(
      depth = intF("log_cluster_depth", 4),
      simTh = Option(st.get("sim_th")).map(_.asDouble).getOrElse(0.4),
      maxChildren = intF("max_children", 100),
      maxClusters = intF("max_clusters", 0),
      paramStr = Option(st.get("param_str")).map(_.asText).getOrElse("<*>"),
      parametrizeNumericTokens =
        Option(st.get("parametrize_numeric_tokens")).forall(_.asBoolean),
      clustersCounter = Option(st.get("clusters_counter")).map(_.asLong)
        .getOrElse(clusters.map(_.eventId).maxOption.getOrElse(0L)),
      clusters = clusters.sortBy(_.eventId).toSeq)
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](1 << 16)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) sys.error("truncated zlib stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }
}
