package graft.sources.v2

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Commit/abort protocol of the V2 staged sink: round-trip fidelity,
  * append vs truncate, abort hygiene, and epoch idempotence. */
class StagedBinSinkSpec extends SparkSpec {

  import spark.implicits._

  private val Fmt = "graft.sources.v2.StagedBinSink"

  private def tmp(): String =
    Files.createTempDirectory("staged_bin").toString

  private def ls(dir: String): Seq[String] =
    if (!Files.exists(Paths.get(dir))) Seq.empty
    else Files.walk(Paths.get(dir)).iterator().asScala
      .filter(Files.isRegularFile(_)).map(_.toString).toSeq

  test("round trip: write via V2 commit, read back value-equal (nested types too)") {
    val dir = tmp()
    val df = spark.range(0, 100, 1, 7)
      .select(col("id"),
        concat(lit("doc-"), col("id")).as("name"),
        (col("id") * 1.5).as("score"),
        when(col("id") % 10 === 0, lit(null).cast("string")).otherwise(lit("x")).as("opt"),
        array(col("id"), col("id") + 1).as("pair"))
    df.write.format(Fmt).mode("append").option("path", dir).save()
    val back = spark.read.format(Fmt).option("path", dir).load()
    assert(back.schema === df.schema)
    assert(back.collect().map(_.toSeq).toSet === df.collect().map(_.toSeq).toSet)
    assert(Files.exists(Paths.get(dir, "_manifest")))
    assert(ls(s"$dir/_staging").isEmpty, "commit must sweep staging")
  }

  test("append accumulates committed files; overwrite truncates them") {
    val dir = tmp()
    spark.range(0, 10).write.format(Fmt).mode("append").option("path", dir).save()
    spark.range(10, 30).write.format(Fmt).mode("append").option("path", dir).save()
    assert(spark.read.format(Fmt).option("path", dir).load().count() === 30L)
    spark.range(0, 5).write.format(Fmt).mode("overwrite").option("path", dir).save()
    val back = spark.read.format(Fmt).option("path", dir).load()
    assert(back.as[Long].collect().sorted.toSeq === (0L until 5L))
    // truncate must actually delete the superseded data files
    assert(ls(s"$dir/data").size === back.rdd.getNumPartitions)
  }

  test("identical staged part names from separate jobs never collide in data/") {
    // pid/tid restart at 0 in every Spark application, so two app runs
    // produce identically-named staged files; commitJob must keep both
    val dir = tmp()
    val root = Paths.get(dir)
    val schema = spark.range(1).schema
    def stageOne(writeId: String, payload: Byte): StagedFile = {
      val staging = Files.createDirectories(root.resolve("_staging").resolve(writeId))
      val f = staging.resolve("part-00000-0.bin") // same base name both runs
      Files.write(f, Array[Byte](payload))
      StagedFile(f.toString, 1L)
    }
    StagedBinSink.commitJob(root, schema, Seq(stageOne("run1", 1)), None, truncate = false)
    StagedBinSink.commitJob(root, schema, Seq(stageOne("run2", 2)), None, truncate = false)
    val m = StagedBinSink.readManifest(root).get
    assert(m.files.size === 2 && m.files.distinct.size === 2,
      s"manifest must list two distinct files: ${m.files}")
    m.files.foreach(f => assert(Files.exists(root.resolve(f)), s"$f missing on disk"))
    // and a truncate commit replaces both without deleting its own file
    StagedBinSink.commitJob(root, schema, Seq(stageOne("run3", 3)), None, truncate = true)
    val m3 = StagedBinSink.readManifest(root).get
    assert(m3.files.size === 1)
    assert(Files.exists(root.resolve(m3.files.head)))
    assert(!Files.exists(root.resolve(m.files.head)) && !Files.exists(root.resolve(m.files(1))),
      "truncate must delete the superseded files")
  }

  test("aborted job leaves no partial state: no manifest, no data, no staging") {
    val dir = tmp()
    val poisoned = spark.range(0, 100, 1, 4)
      .select(when(col("id") === 57, raise_error(lit("boom")))
        .otherwise(col("id")).as("id"))
    intercept[Exception] {
      poisoned.write.format(Fmt).mode("append").option("path", dir).save()
    }
    assert(!Files.exists(Paths.get(dir, "_manifest")), "aborted job must not commit")
    assert(ls(s"$dir/data").isEmpty, "no data files may survive an abort")
    assert(ls(s"$dir/_staging").isEmpty, "abort must sweep staged files")
    // and the path remains writable afterwards
    spark.range(0, 3).write.format(Fmt).mode("append").option("path", dir).save()
    assert(spark.read.format(Fmt).option("path", dir).load().count() === 3L)
  }

  test("a re-delivered epoch is a no-op (batchId-idempotent commit)") {
    
    val dir = tmp()
    val root = Paths.get(dir)
    val schema = spark.range(1).schema
    def stage(name: String): Path = {
      val d = Files.createDirectories(root.resolve("_staging").resolve("w1"))
      Files.write(d.resolve(name), Array[Byte](0, 0, 0, 8, 1, 0, 0, 0, 0, 0, 0, 0))
    }
    val f1 = stage("part-a.bin")
    StagedBinSink.commitJob(root, schema,
      Seq(StagedFile(f1.toString, 1L)), Some(7L), truncate = false)
    val after1 = StagedBinSink.readManifest(root).get
    assert(after1.files.size === 1 && after1.epochs === Set(7L))
    // same epoch re-delivered (e.g. driver restart replays the batch):
    // the staged duplicate is discarded, the manifest is untouched
    val f2 = stage("part-b.bin")
    StagedBinSink.commitJob(root, schema,
      Seq(StagedFile(f2.toString, 1L)), Some(7L), truncate = false)
    val after2 = StagedBinSink.readManifest(root).get
    assert(after2.files === after1.files && after2.epochs === Set(7L))
    assert(!Files.exists(f2), "re-delivered epoch must discard its staged files")
    // the next epoch commits normally
    val f3 = stage("part-c.bin")
    StagedBinSink.commitJob(root, schema,
      Seq(StagedFile(f3.toString, 1L)), Some(8L), truncate = false)
    assert(StagedBinSink.readManifest(root).get.epochs === Set(7L, 8L))
  }

  test("streaming write: micro-batches land through the epoch protocol") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tmp()
    val input = MemoryStream[Long]
    val q = input.toDF().writeStream.format(Fmt)
      .option("path", dir)
      .option("checkpointLocation", Files.createTempDirectory("sbs_ckpt").toString)
      .start()
    try {
      input.addData(1L, 2L, 3L); q.processAllAvailable()
      input.addData(4L, 5L); q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.format(Fmt).option("path", dir).load()
    assert(back.as[Long].collect().sorted.toSeq === (1L to 5L))
  }
}
