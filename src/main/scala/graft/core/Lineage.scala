package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage cuts for iterative operators (PageRank / LPA / seed distances /
  * connected components / BPE / PQ codebooks).
  *
  * Every fixpoint loop here must cut its plan per round — without it
  * round i embeds one or two copies of round i−1 and the plan grows
  * geometrically. HOW it cuts is a deployment decision:
  *
  *  - `localCheckpoint` (the default) materializes to executor block
  *    storage: zero filesystem setup, right for local[?] and for probes —
  *    but blocks die with their executor, so on a real cluster a lost
  *    executor kills the whole iterative job mid-flight.
  *  - reliable `checkpoint` writes to the fault-tolerant checkpoint
  *    directory (HDFS/S3): an executor loss recomputes nothing older
  *    than the last round. That is the correct 1000-executor shape.
  *
  * Callers opt in by setting the session conf
  * `spark.graft.checkpointDir` (e.g. `hdfs:///tmp/graft-ckpt`); the first
  * cut installs it as the SparkContext checkpoint dir (respecting one the
  * user already set) and every subsequent cut in that session is
  * reliable. Unset (the default), behavior is byte-identical to the old
  * inline `localCheckpoint` calls. Values never change either way —
  * GraphSpec pins equality across both modes.
  */
object Lineage {
  /** Session conf: when set, iterative lineage cuts use RELIABLE
    * checkpointing into this directory instead of `localCheckpoint`. */
  val ConfKey = "spark.graft.checkpointDir"

  def cut(df: DataFrame, eager: Boolean = true): DataFrame = {
    val sess = df.sparkSession
    sess.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        val sc = sess.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case _ => df.localCheckpoint(eager)
    }
  }

  /** Chainable syntax: `df.cutLineage()` ≡ `Lineage.cut(df)`. */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage(eager: Boolean = true): DataFrame = cut(df, eager)
  }
}
