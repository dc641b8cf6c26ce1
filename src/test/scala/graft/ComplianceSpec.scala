package graft

import org.apache.spark.sql.functions._
import graft.operators.Compliance

class ComplianceSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = graft.core.Tables.documents(spark, sf0001)

  test("redactPii: finds and redacts planted email, ip, phone") {
    val df = Seq(
      (1L, "write to alice.smith+spam@sub.example.org today"),
      (2L, "server 192.168.0.1 and backup 10.0.0.255 are up"),
      (3L, "call 555-0199 or 555-2000"),
      (4L, "clean text with no pii at all"),
      (5L, "mixed bob@x.io at 172.16.4.2 dial 555-1234")).toDF("doc_id", "text")
    val out = Compliance.redactPii(df)
      .select($"doc_id", $"n_emails", $"n_ips", $"n_phones", $"redacted")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(out(1L) == ((1, 0, 0, "write to <EMAIL> today")))
    assert(out(2L) == ((0, 2, 0, "server <IP> and backup <IP> are up")))
    assert(out(3L) == ((0, 0, 2, "call <PHONE> or <PHONE>")))
    assert(out(4L) == ((0, 0, 0, "clean text with no pii at all")))
    assert(out(5L) == ((1, 1, 1, "mixed <EMAIL> at <IP> dial <PHONE>")))
  }

  test("redactPii: redaction order keeps email hosts out of the ip pattern") {
    // a digit-heavy email host must be consumed by <EMAIL>, not torn by <IP>
    val df = Seq((1L, "x user@10.0.0.1.example.com y")).toDF("doc_id", "text")
    val r = Compliance.redactPii(df).select($"redacted").as[String].head()
    assert(r == "x <EMAIL> y", r)
  }

  test("contaminationScores/decontaminate: planted overlap, exact threshold") {
    // corpus doc 1 shares two trigrams with the test set, doc 2 shares one,
    // doc 3 none → only doc 1 is flagged at minOverlap=2
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // trigrams incl "alpha beta gamma", "beta gamma delta"
      (2L, "alpha beta gamma zz yy"),         // only "alpha beta gamma" shared
      (3L, "qq ww ee rr tt")).toDF("doc_id", "text")
    val test = Seq((100L, "alpha beta gamma delta xx")).toDF("doc_id", "text")
    val scores = Compliance.contaminationScores(corpus, test, 3, 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores == Map(1L -> 2L))
    val clean = Compliance.decontaminate(corpus, test, 3, 2L)
      .select($"doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 3L))
  }

  test("contaminationScores: test-set side broadcasts, corpus side never shuffles into the join") {
    val docs = docsDf
    val plan = Compliance.contaminationScores(
      docs.filter($"doc_id" % 97 =!= 0), docs.filter($"doc_id" % 97 === 0), 3, 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("repetitionStats: top bigram multiplicity and lexicographic ties") {
    val df = Seq(
      (1L, "a b a b a b c"),   // "a b" x3, "b a" x2 → top "a b",3
      (2L, "z y z y"),          // "z y" x2, "y z" x1
      (3L, "t1 t2 t3 t4"),      // all bigrams once → lexicographic min wins
      (4L, "solo")).toDF("doc_id", "text") // <2 tokens → no bigram row
    val out = Compliance.repetitionStats(df)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3), r.getLong(4)))).toMap
    assert(out(1L) == ((7, 3, "a b", 3L)))
    assert(out(2L) == ((4, 2, "z y", 2L)))
    assert(out(3L) == ((4, 4, "t1 t2", 1L)))
    assert(!out.contains(4L))
  }

  test("repetitionStats: duplicate-token signal on the real corpus") {
    // every doc: n_distinct <= n_tokens, and top_count >= 1
    val out = Compliance.repetitionStats(docsDf)
    assert(out.filter($"n_distinct" > $"n_tokens").isEmpty)
    assert(out.filter($"top_count" < 1).isEmpty)
    assert(out.count() > 0)
  }

  test("kAnonymityAudit: singletons are exposed, big classes are not, zero-k reports") {
    // classes: (a,x) size 1 (unique row!), (a,y) size 3, (b,x) size 6
    val df = (Seq(("a", "x")) ++ Seq.fill(3)(("a", "y")) ++ Seq.fill(6)(("b", "x")))
      .toDF("qi1", "qi2")
    val out = Compliance.kAnonymityAudit(df, Seq("qi1", "qi2"), ks = Seq(2, 5, 100))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(2L) == ((1L, 1L, 3L, 10L)), s"got $out")   // the singleton
    assert(out(5L) == ((2L, 4L, 3L, 10L)), s"got $out")   // + the size-3 class
    assert(out(100L) == ((3L, 10L, 3L, 10L)), s"got $out") // everything
  }

  test("lDiversityAudit: a monoculture class is at risk however large it is") {
    // (a): 5 rows all sensitive 's1' (div 1); (b): 2 rows, two values (div 2)
    val df = (Seq.fill(5)(("a", "s1")) ++ Seq(("b", "s1"), ("b", "s2")))
      .toDF("qi", "sen")
    val out = Compliance.lDiversityAudit(df, Seq("qi"), "sen", ls = Seq(2, 3))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(2L) == ((1L, 5L)), s"got $out") // only the monoculture
    assert(out(3L) == ((2L, 7L)), s"got $out") // both classes below l=3
  }
}
