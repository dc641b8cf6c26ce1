package graft.core

import org.apache.spark.sql.SparkSession

/** Engine-wide session tuning applied by every driver-contract main
  * (Bench/Verify) and the probe harness — ONE place for static confs the
  * r13 profiling justified, so a probe measures the same engine the bench
  * reports.
  *
  * `spark.shuffle.sort.bypassMergeThreshold = 1` (r13, guide §2.2): with
  * R ≤ the default threshold (200), Spark's bypass shuffle writer opens
  * M·R files per exchange — and jstack sampling of the bench's iterative
  * queries (kmeans assign rounds, q172/q108) showed executor threads
  * dominated by `DiskBlockObjectWriter.open`/`copyFileStreamNIO`, ~10 ms
  * of filesystem overhead per file on this sandbox: a small exchange at
  * R=32 paid ~10 core-s in file churn regardless of bytes. Threshold 1
  * routes every shuffle through the serialized sort writer (ONE file +
  * index per map task — the same writer any R > 200 shuffle already
  * uses at scale), measured 4.1×/4.5×/4.2× on q172's three steady-state
  * Lloyd stages (16.4/13.0/11.5 → 4.0/2.9/2.7 core-s) and regression-free
  * on the large exchanges (q104/q46 unchanged within sd). Scale-honest:
  * production R exceeds 200 on any real cluster, where this conf is
  * inert — it only removes the small-R file-count cliff the local bench
  * (R = SPARK_GRAFT_CPUS) sits on. Env override for A/B probes.
  */
object SessionTuning {
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.shuffle.sort.bypassMergeThreshold",
      sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "1"))
}
