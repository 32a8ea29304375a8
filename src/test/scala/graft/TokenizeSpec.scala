package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextExprs

/** AsciiTokens must be bit-equal to the regex form it replaces —
  * `regexp_extract_all(lower(text), '[a-z0-9]+')` — on the corpus and
  * on edge-case strings (the DuckDB oracles keep the regex, so any
  * divergence is an oracle mismatch). */
class TokenizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def regexToks(c: org.apache.spark.sql.Column) =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  test("matches regexp_extract_all(lower) on the documents corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val diff = docs.select(col("doc_id"),
        TextExprs.tokens(col("text")).as("fast"),
        regexToks(col("text")).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
  }

  test("edge cases: empty, separators-only, case folding, digits, unicode") {
    import spark.implicits._
    val cases = Seq("", "  \t\n!!", "MiXeD CaSe42", "a", "7", "a-b_c.d",
      "trailing space ", " leading", "unicode é ü: split points",
      "A" * 100 + "0" * 50)
    val df = cases.toDF("text")
    val diff = df.select(TextExprs.tokens(col("text")).as("fast"),
        regexToks(col("text")).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
    // sanity: expected concrete values
    val got = df.select(TextExprs.tokens(col("text"))).collect()
      .map(_.getSeq[String](0).toList)
    assert(got(2) == List("mixed", "case42"))
    assert(got(5) == List("a", "b", "c", "d"))
    assert(got(8) == List("unicode", "split", "points"))
  }

  test("hashed_grams is bit-equal to the HOF hash+dedup it replaces") {
    // the r17 compiled shingle kernel (functions.HashedGrams) must be
    // value- AND order-identical to
    // array_distinct(transform(gramsN(ts,3), g -> xxhash64(g))) —
    // every shingle consumer (dedup/corpus/pipeline/streaming ingest)
    // rides on this identity
    val docs = graft.sources.Tables.documents(spark, sf)
    val ts = TextExprs.tokens(col("text"))
    val slow = array_distinct(transform(TextExprs.gramsN(col("ts"), 3),
      g => xxhash64(g)))
    val diff = docs.select(col("doc_id"), ts.as("ts"))
      .select(col("doc_id"),
        TextExprs.hashedGramsN(col("ts"), 3).as("fast"), slow.as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
    // edge cases: short docs (0/1/2 tokens -> empty), exact 3 tokens,
    // repeated grams (dedup), null text. On NULL input the two forms
    // differ at the array level BY DESIGN — the HOF guard emits [],
    // hashed_grams propagates null — and both explode to ZERO rows,
    // which is the only contract hashedShinglesOf consumes; the
    // comparison below states the guard explicitly.
    import spark.implicits._
    val cases = Seq("", "one", "one two", "one two three",
      "a b c a b c a b c", null).toDF("text")
    val got = cases
      .select(TextExprs.tokens(col("text")).as("ts"))
      .select(TextExprs.hashedGramsN(col("ts"), 3).as("fast"),
        when(col("ts").isNotNull, slow).as("slow"))
    assert(got.filter(not(col("fast") <=> col("slow"))).count() == 0)
    val rows = got.collect()
    assert(rows(0).getSeq[Long](0).isEmpty)
    assert(rows(3).getSeq[Long](0).size == 1)
    assert(rows(4).getSeq[Long](0).size == 3) // 7 grams, 3 distinct
    assert(rows(5).isNullAt(0))
  }

  test("graft_tokens is callable from SQL via the extension") {
    val r = spark.sql("SELECT graft_tokens('Hello World 42!') AS t")
      .collect().head.getSeq[String](0)
    assert(r == Seq("hello", "world", "42"))
  }

  test("size(graft_tokens) rewrites to the fused count and agrees with it") {
    val docs = graft.sources.Tables.documents(spark, sf)
    docs.createOrReplaceTempView("tc_docs")
    // the optimizer rule must fire on non-literal input (a literal
    // argument constant-folds to a number before any plan assert
    // could see the fused expression — also correct) ...
    val df = spark.sql("SELECT size(graft_tokens(text)) AS n FROM tc_docs")
    assert(df.queryExecution.optimizedPlan.toString.contains("ascii_token_count"))
    // ... and the fused count must equal the regex array size on the
    // whole corpus (it shares Tokenize's run scanner, but prove it)
    val diff = spark.sql(
      """SELECT doc_id FROM tc_docs
        |WHERE size(graft_tokens(text)) <>
        |  size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))""".stripMargin)
    assert(diff.count() == 0)
    // null text → null count (non-legacy size semantics preserved;
    // here via constant folding, which agrees with the fused form)
    val n = spark.sql("SELECT size(graft_tokens(CAST(NULL AS STRING))) AS n")
    assert(n.collect().head.isNullAt(0))
  }
}
