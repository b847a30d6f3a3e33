package graft.ops

/** What a capped candidate-generation stage dropped: bucket keys whose
  * population exceeded the super-bucket cap, and the rows inside them.
  * A zero report means the cap did not engage — results are exact.
  */
case class CapReport(pipeline: String, maxBucket: Int,
                     droppedBuckets: Long, droppedRows: Long) {
  def engaged: Boolean = droppedBuckets > 0
}

/** Observability registry for the super-bucket caps (SURVEY "no silent
  * caps"): every capped pipeline records how much it dropped, so a corpus
  * that outgrows its LSH geometry produces a visible recall-loss signal
  * instead of an empty result indistinguishable from "no duplicates".
  *
  * Per-pipeline latest-report semantics (the common monitoring question is
  * "did the LAST run drop anything"); Bench snapshots this into its JSON
  * line and engaged caps are logged at WARN.
  */
object CapMetrics {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val reports =
    scala.collection.concurrent.TrieMap.empty[String, CapReport]

  def record(r: CapReport): Unit = {
    reports.put(r.pipeline, r)
    if (r.engaged)
      log.warn(
        s"super-bucket cap engaged in ${r.pipeline}: dropped " +
          s"${r.droppedBuckets} buckets / ${r.droppedRows} rows over " +
          s"maxBucket=${r.maxBucket} — recall loss; widen the band key " +
          s"space (more planes / wider signature) for this corpus size")
    else
      log.info(s"${r.pipeline}: no buckets over maxBucket=${r.maxBucket} (exact)")
  }

  def get(pipeline: String): Option[CapReport] = reports.get(pipeline)

  def snapshot: Map[String, CapReport] = reports.toMap

  def clear(): Unit = reports.clear()
}
