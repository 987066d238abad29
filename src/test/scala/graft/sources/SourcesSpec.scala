package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("multiline JSON scan reads one-array-per-file tweet batches") {
    val df = Readers.multilineJson(spark, resourcePath("tweets_fixture.json"))
    assert(df.count() == 9)
    assert(df.schema.fieldNames.contains("quoted_status"))
  }

  test("ordered file batches extract the filename epoch for event-time replay") {
    val dir = Files.createTempDirectory("batches").toFile
    val a = new java.io.File(dir, "tweets_1634810000.json")
    val b = new java.io.File(dir, "tweets_1634820000.json")
    Files.writeString(a.toPath, """[{"id": 2, "text": "later"}]""")
    Files.writeString(b.toPath, """[{"id": 1, "text": "earlier"}]""")
    // no caller-side orderBy: the source itself must deliver replay order
    val df = Readers.orderedFileBatches(spark, dir.getAbsolutePath)
    val epochs = df.select("__file_epoch").collect().map(_.getLong(0)).toSeq
    assert(epochs == Seq(1634810000L, 1634820000L))
  }

  test("positional CSV scan maps columns by index, ignoring header names") {
    val dir = Files.createTempDirectory("poscsv")
    Files.writeString(dir.resolve("part.csv"),
      "wrong_name,other_name,third\n1,alice,2.5\n2,bob,7.0\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id LONG, name STRING, score DOUBLE")
    val df = Readers.csvPositional(spark, dir.toString, schema)
    assert(df.columns.toSeq == Seq("id", "name", "score"))
    val rows = df.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, "alice", 2.5), (2L, "bob", 7.0)))
  }

  test("scrubbed CSV sink stringifies arrays python-style and scrubs newlines") {
    val out = Files.createTempDirectory("csvout").resolve("x").toString
    val df = Seq(
      (1L, "line1\nline2 \"quoted\"", Seq("a", "b")),
      (2L, "plain", Seq.empty[String])
    ).toDF("id", "txt", "tags")
    Sinks.csvScrubbed(df, out, idCols = Seq("id"), textCols = Seq("txt"), arrayCols = Seq("tags"))
    val back = Readers.csv(spark, out).orderBy("id").collect()
    assert(back(0).getString(1) == "line1|line2 'quoted'")
    assert(back(0).getString(2) == "['a', 'b']")
    assert(back(1).getString(2) == "[]")
  }

  test("scrubbed CSV sink: nullArraysAsNone emits the reference's 'None' literal") {
    val out = Files.createTempDirectory("csvout").resolve("x").toString
    val df = Seq((1L, Option(Seq("a"))), (2L, None: Option[Seq[String]]))
      .toDF("id", "tags")
    Sinks.csvScrubbed(df, out, idCols = Seq("id"), textCols = Nil,
      arrayCols = Seq("tags"), nullArraysAsNone = true)
    val back = Readers.csv(spark, out).orderBy("id").collect()
    assert(back(0).getString(1) == "['a']")
    assert(back(1).getString(1) == "None")
  }

  test("jsonl sink round-trips rows as line-delimited JSON shards") {
    val out = Files.createTempDirectory("jsonlout").resolve("x").toString
    val df = Seq((1L, "alpha beta", Seq("a", "b")), (2L, "gamma", Seq.empty[String]))
      .toDF("doc_id", "text", "tags")
    Sinks.jsonl(df.repartition(2), out)
    // each part file is valid JSONL: one parseable object per line
    val lines = Files.list(java.nio.file.Paths.get(out)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(p)).asScala)
    assert(lines.length == 2)
    assert(lines.forall(l => l.startsWith("{") && l.endsWith("}")))
    val back = spark.read.json(out).orderBy("doc_id").collect()
    assert(back.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(back(0).getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("a", "b"))
  }

  test("compactFiles merges a many-file table, preserving content exactly") {
    def parquetFiles(dir: String) =
      Files.list(java.nio.file.Paths.get(dir)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.endsWith(".parquet"))
    val dir = Files.createTempDirectory("compact").resolve("t").toString
    val df = (1L to 500L).map(i => (i, s"row $i")).toDF("id", "s")
    df.repartition(20).write.parquet(dir)
    assert(parquetFiles(dir).length == 20)
    val before = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // generous target: everything fits one file
    val n = Sinks.compactFiles(spark, dir, targetFileBytes = 1L << 30)
    assert(n == 1)
    assert(parquetFiles(dir).length == 1)
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before)
    // sub-file-size target: ceil(bytes/target) files, content still exact
    val bytes = parquetFiles(dir).map(Files.size).sum
    val n2 = Sinks.compactFiles(spark, dir, targetFileBytes = bytes / 3 + 1)
    assert(n2 >= 2 && parquetFiles(dir).length == n2)
    assert(spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == before)
  }

  test("compactFiles preserves a Hive-partitioned layout and its pruning") {
    val dir = Files.createTempDirectory("compactp").resolve("t").toString
    val df = (1L to 200L).map(i => (i, s"v$i", s"p${i % 2}")).toDF("id", "s", "part")
    df.repartition(10).write.partitionBy("part").parquet(dir)
    val before = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    Sinks.compactFiles(spark, dir, targetFileBytes = 1L << 30)
    // the partition directories survive, each compacted to one file
    Seq("p0", "p1").foreach { p =>
      val sub = java.nio.file.Paths.get(dir, s"part=$p")
      assert(Files.isDirectory(sub), s"partition dir part=$p was destroyed")
      val files = Files.list(sub).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.endsWith(".parquet"))
      assert(files.length == 1)
    }
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(after == before)
    // a partition subpath read still works (the consumer contract a flat
    // rewrite would break)
    assert(spark.read.parquet(s"$dir/part=p0").count() == 100)
  }
}
