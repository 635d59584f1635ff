package graft

import graft.model.FieldSelector
import graft.pipes._
import graft.sources.{CsvTap, SinkMode, TextLineTap}
import graft.exec.Flow

/** The reference's flagship example, ported 1:1
  * (`/root/reference/src/main/java/com/dataartisans/flink/cascading/example/WordCount.java:36-63`):
  * text source → Each(RegexSplitGenerator) → CountBy → sink. */
class WordCountSpec extends SparkSpec {
  implicit def s: org.apache.spark.sql.SparkSession = spark

  test("wordcount flow end-to-end through taps") {
    val dir = java.nio.file.Files.createTempDirectory("wc").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/input.txt"),
      "the quick brown fox\nthe lazy dog\nthe fox")

    val flow = Pipe.source(TextLineTap(s"$dir/input.txt"))
      .generate(RegexSplitGenerator("token", "\\s+"),
        args = FieldSelector("line"), out = FieldSelector.Results)
      .countBy(Seq("token"), as = "count")
    Flow.write(flow, CsvTap(s"$dir/out", delimiter = "\t"), SinkMode.Replace)

    val back = spark.read.option("delimiter", "\t").csv(s"$dir/out")
      .collect().map(r => r.getString(0) -> r.getString(1).toLong).toMap
    assert(back("the") == 3L)
    assert(back("fox") == 2L)
    assert(back("dog") == 1L)
    assert(back.size == 6)
  }

  test("dynamic-arity text processing (Fields.UNKNOWN escape hatch)") {
    // SURVEY.md §7.4: UNKNOWN/dynamic arity is confined to text entry
    // points as a single array column
    val dir = java.nio.file.Files.createTempDirectory("dyn").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.txt"), "a,b,c\nx,y\nlone")
    val df = TextLineTap(s"$dir/in.txt").read(spark)
      .selectExpr("split(line, ',') AS fields")
    val arities = df.selectExpr("size(fields) AS n").collect().map(_.getInt(0)).sorted
    assert(arities.toSeq == Seq(1, 2, 3))
    // positional access on the dynamic row
    val firsts = df.selectExpr("fields[0] AS f0").collect().map(_.getString(0)).toSet
    assert(firsts == Set("a", "x", "lone"))
  }
}
