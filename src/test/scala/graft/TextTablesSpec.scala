package graft

import java.nio.file.Files

import graft.sources.TextTables

/** Round-trip fidelity of the schema'd JSONL/CSV source-sinks on the
  * adversarial cases the fixture tables don't contain: nulls, empty
  * strings, quotes, backslashes, commas, unicode, embedded newlines.
  */
class TextTablesSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[(Long, Option[String], Option[String])] = Seq(
    (1L, Some("""he said "hi" and left"""), Some("en")),
    (2L, Some("back\\slash and, comma"), None),
    (3L, None, Some("")),
    (4L, Some("unicode: café 中文"), Some("zh")),
    (5L, Some("line1\nline2"), Some("en")))

  private def df = rows.toDF("id", "text", "lang")

  test("jsonl round-trips nulls, empties, quotes, unicode, newlines") {
    val path = Files.createTempDirectory("graft_jsonl_spec").toString
    TextTables.writeJsonl(df, path)
    val back = TextTables.readJsonl(spark, df.schema, path)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))))
      .sortBy(_._1).toSeq
    // JSON writers drop null fields; they read back as null (None) —
    // and empty string stays empty string, not null
    assert(back === rows)
  }

  test("csv round-trips with null/empty distinction (no embedded newlines)") {
    val flat = rows.filterNot(_._2.exists(_.contains("\n")))
    val path = Files.createTempDirectory("graft_csv_spec").toString
    TextTables.writeCsv(flat.toDF("id", "text", "lang"), path)
    val back = TextTables.readCsv(spark, df.schema, path)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))))
      .sortBy(_._1).toSeq
    assert(back === flat)
  }

  test("xml round-trips markup chars, nulls, unicode, newlines") {
    val xmlRows = rows :+ (6L, Some("<tag> & \"entities\" 'quoted'"), Some("en"))
    val path = Files.createTempDirectory("graft_xml_spec").toString
    TextTables.writeXml(xmlRows.toDF("id", "text", "lang"), path)
    val back = TextTables.readXml(spark, df.schema, path)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))))
      .sortBy(_._1).toSeq
    // the writer entity-escapes <>&"' so markup survives; null fields are
    // absent elements and read back as null, empty string stays empty
    assert(back === xmlRows)
  }
}
