package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extension-dispatched document loading — the distributed equivalent
  * of the reference's loader registry (conversadocs/bones.py:32-44
  * `EXTENSIONS` and bones.py:47-64 `load_db`): each extension maps to
  * a Spark reader recipe instead of a LangChain loader class.
  *
  * Text-bearing formats go through the text source (wholetext, one
  * row per file); HTML additionally strips tags/entities in the
  * engine. Binary formats (pdf/doc/epub/...) go through binaryFile
  * and a STUB extractor — the real parsers aren't in this container,
  * so the text is a clearly-marked placeholder while the schema,
  * file metadata, and distribution shape are real.
  */
object DocLoader {

  val textExtensions: Set[String] = Set("txt", "md")
  val htmlExtensions: Set[String] = Set("html", "htm")
  val binaryExtensions: Set[String] = Set(
    "pdf", "doc", "docx", "enex", "epub", "odt", "ppt", "pptx")

  private def ext(pathCol: org.apache.spark.sql.Column) =
    lower(regexp_extract(pathCol, "\\.([A-Za-z0-9]+)$", 1))

  /** Load every supported file under `dir` into
    * (source, format, text, n_chars). */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val text = spark.read.option("wholetext", "true")
      .textFile(s"$dir/*")
      .select(col("value").as("raw"),
        col("_metadata.file_path").as("source"))
      .withColumn("format", ext(col("source")))
      .filter(col("format").isin((textExtensions ++ htmlExtensions).toSeq: _*))
      .withColumn("text",
        when(col("format").isin(htmlExtensions.toSeq: _*),
          // tag and entity strip — a real pipeline would use a parser
          trim(regexp_replace(regexp_replace(col("raw"), "<[^>]*>", " "),
            "&[a-zA-Z]+;", " ")))
          .otherwise(col("raw")))
      .select(col("source"), col("format"), col("text"))

    val binary = spark.read.format("binaryFile")
      .load(s"$dir/*")
      .withColumn("format", ext(col("path")))
      .filter(col("format").isin(binaryExtensions.toSeq: _*))
      .select(col("path").as("source"), col("format"),
        // STUB: a pdf/doc parser plugs in here (mapPartitions, like
        // graft.multimodal.Binary.decodeBatch)
        concat(lit("[unparsed "), col("format"), lit(" document, "),
          length(col("content")), lit(" bytes]")).as("text"))

    text.unionByName(binary)
      .withColumn("n_chars", length(col("text")).cast("long"))
  }
}
