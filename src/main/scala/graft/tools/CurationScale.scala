package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Curation

/** Scaling probe for the curation operators: runs each on 1×/4×/16×
  * replications of the sf0.1 documents/embeddings tables (shifted ids).
  * The map-only ops (filter/sample/quantize) must scale ~linearly with
  * rows; bloomReferenceDedup must stay scan-bound (its join side is
  * duplicate-bounded, and replication is the adversarial regime where
  * every doc is a cross-corpus duplicate). Numbers recorded in SCALING.md.
  */
object CurationScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val baseDocs = Tables.documents(spark, sfDir)
    val baseEmb = Tables.embeddings(spark, sfDir)
    val nD = baseDocs.count()
    val nE = baseEmb.count()
    val mainReps = sys.env.get("SPARK_GRAFT_MAIN_REPS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 4, 16))
    for (r <- mainReps) {
      val docs = (0 until r).map(i => baseDocs.select(
          (col("doc_id") + lit(i * 10L * nD)).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      val embs = (0 until r).map(i => baseEmb.select(
          (col("vec_id") + lit(i * 10L * nE)).as("vec_id"),
          col("embedding"), col("label")))
        .reduce(_ union _).repartition(32).localCheckpoint(true)
      println(s"[scale] corpus ${r}x = ${docs.count()} docs, ${embs.count()} vecs")
      val kept = time(s"q70 qualityFilter ${r}x") {
        Curation.qualityFilter(docs).count()
      }
      val sampled = time(s"q72 stratifiedSample ${r}x") {
        Curation.stratifiedSample(docs, "lang",
          Map("en" -> 100, "de" -> 500, "es" -> 500, "fr" -> 500, "zh" -> 500)).count()
      }
      val quantized = time(s"q74 quantizeInt8 ${r}x") {
        // count() over the quantized output forces every qvec without an
        // extra pass over the input
        Curation.quantizeInt8(embs, "embedding")
          .agg(sum(element_at(col("qvec"), 1)), count(lit(1))).head().getLong(1)
      }
      time(s"q74 quantizeInt8 HOF twin ${r}x") {
        // the interpreted-lambda spelling, kept timed so the native
        // expression's advantage stays measured (SCALING.md)
        Curation.quantizeInt8Hof(embs, "embedding")
          .agg(sum(element_at(col("qvec"), 1)), count(lit(1))).head().getLong(1)
      }
      val capped = time(s"q69 capPerDomain ${r}x") {
        Curation.capPerDomain(docs, "source", 10).count()
      }
      // adversarial reference dedup: reference = the 1× base corpus, so at
      // 16× EVERY incoming doc is a true duplicate — maximum verification load
      val fps = docs.select(col("doc_id"), graft.functions.TextOps.fingerprint(col("text")).as("fp"))
      val ref = baseDocs.select(graft.functions.TextOps.fingerprint(col("text")).as("fp"))
      val newDocs = time(s"q71 bloomReferenceDedup ${r}x (worst case: all dups)") {
        Curation.bloomReferenceDedup(fps, ref, "fp", math.max(nD, 1L), 0.01).count()
      }
      // compliance / maintenance / prep stages
      val redacted = time(s"q76 redactPii ${r}x") {
        // metric = total PII hits found (index 0, the sum), not the row count
        graft.operators.Compliance.redactPii(docs)
          .agg(sum(col("n_emails") + col("n_ips") + col("n_phones")), count(lit(1)))
          .head().getLong(0)
      }
      // eval set stays FIXED (the 1× base's doc_id%97 slice) while the
      // corpus replicates — the asymmetric-join regime the op is built for
      val contaminated = time(s"q77 contaminationScores ${r}x (fixed eval set)") {
        graft.operators.Compliance.contaminationScores(
          docs, baseDocs.filter(col("doc_id") % 97 === 0), 3, 2L).count()
      }
      val repAudit = time(s"q79 repetitionStats ${r}x") {
        graft.operators.Compliance.repetitionStats(docs).count()
      }
      val chunks = time(s"q84 chunkDocuments ${r}x") {
        Curation.chunkDocuments(docs, 32, 24).agg(sum(length(col("chunk"))), count(lit(1)))
          .head().getLong(1)
      }
      println(s"[scale]   kept=$kept sampled=$sampled quantized=$quantized " +
        s"capped=$capped new=$newDocs pii=$redacted contam=$contaminated " +
        s"rep=$repAudit chunks=$chunks")
    }
    spark.stop()
  }
}
