package graft

import graft.sources.RootIngest

class RootIngestSpec extends SparkSpec {

  test("missing sidecar fails with the documented conversion recipe") {
    val ex = intercept[UnsupportedOperationException] {
      RootIngest.fromRoot(spark, "/tmp/no_such_sample.root")
    }
    assert(ex.getMessage.contains("uproot"))
    assert(ex.getMessage.contains("/tmp/no_such_sample.root.parquet"))
    assert(ex.getMessage.contains("myana/mytree"))
  }

  test("present sidecar is read as a normal parquet scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rootingest").toString
    val root = s"$dir/sample.root"
    // the .root itself never needs to exist — only its converted sidecar
    Seq((1L, 42.0), (2L, 7.5)).toDF("event", "met")
      .write.mode("overwrite").parquet(RootIngest.convertedPath(root))
    val df = RootIngest.fromRoot(spark, root)
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("event", "met"))
  }

  test("explicit converted-path override wins") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rootingest2").toString
    val conv = s"$dir/elsewhere.parquet"
    Seq((3L, 1.0)).toDF("event", "met").write.mode("overwrite").parquet(conv)
    val df = RootIngest.fromRoot(spark, s"$dir/sample.root", converted = Some(conv))
    assert(df.count() == 1)
  }

  test("SerializableHadoopConf: session hadoop settings survive the task boundary") {
    // the distributed decode must see the SESSION's configuration on
    // executors (credentials, defaultFS, spark.hadoop.*) — r8 advice: a
    // fresh Configuration() there silently dropped all of it
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("fs.graft.probe.key", "v1")
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(new graft.sources.SerializableHadoopConf(conf)); oos.close()
    val back = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[graft.sources.SerializableHadoopConf]
    assert(back.value.get("fs.graft.probe.key") == "v1")
  }
}
