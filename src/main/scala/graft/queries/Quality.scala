package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The two canonical published corpus-filter rule sets every LLM
  * training pipeline runs before anything else touches the data:
  * Gopher rules (Rae et al. 2021, "Scaling Language Models", appendix
  * A1.1) and C4 rules (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning", §2.2). Both are deliberately expressed in PURE
  * INTEGER arithmetic — every ratio threshold `r ≤ k/10` is compared
  * as `10·num ≤ k·den` — so the Spark plan and the DuckDB oracle
  * cannot diverge by a float ulp at any scale (the r13/r14 ranking
  * lesson applied at the design stage, not as a fix).
  *
  * The synthetic corpus is single-line unpunctuated word salad, so
  * several rule branches (bullets, ellipses, symbols, terminal
  * punctuation) would never fire on it; each query therefore unions a
  * PLANTED literal extension (the text_langid_cjk rule) that puts
  * every decision branch under the oracle hash, while the real corpus
  * exercises the volume rules (word counts, stopwords, word shape).
  *
  * Scale shape: both filters are per-row expression pipelines — one
  * scan, zero shuffles before the final sort, embarrassingly parallel
  * at any corpus size and fully inside whole-stage codegen. */
object Quality {

  private def toks(c: Column): Column = graft.functions.TextExprs.tokens(c)

  /** Render a (possibly multi-line) planted doc as a DuckDB SQL
    * expression — newlines become chr(10) concatenation so the VALUES
    * literal stays one physical line. */
  private def sqlText(t: String): String =
    "'" + t.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"

  private def plantedSql(docs: Seq[(Long, String)]): String =
    docs.map { case (id, t) => s"($id, ${sqlText(t)})" }
      .mkString(",\n      |    ")

  // ---------------------------------------------------------------
  // Gopher rules
  // ---------------------------------------------------------------

  /** Gopher's required-stopword list (Rae et al. A1.1: a doc must
    * contain at least TWO of these to pass the stop-word rule). */
  private val gopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** One planted doc per rule branch the salad corpus cannot reach:
    * ids sit far above any scale factor's real doc_id range. */
  private val gopherPlanted: Seq[(Long, String)] = Seq(
    // passes every rule: 60 words, normal lengths, stops present
    (9100000001L, Iterator.fill(6)(
      "the quick brown fox jumps over that lazy dog and")
      .mkString(" ") + " we have fun with all of them today again"),
    // bullet-heavy: every line starts with a bullet -> bullet_ok false
    (9100000002L, Iterator.fill(10)(
      "- the cat and the dog have fun with toys today").mkString("\n")),
    // ellipsis-heavy: 4 of 10 line ends -> ellipsis_ok false (0.4>0.3)
    (9100000003L, (Iterator.fill(4)(
      "the story keeps going on and on with more to come...") ++
      Iterator.fill(6)(
        "the story settles down and that is all of it now"))
      .mkString("\n")),
    // symbol-heavy: 20 hashes vs 64 words -> symbol_ok false (>0.1);
    // hashes ride ON words so the alpha-word rule stays green
    (9100000004L, Iterator.fill(20)("tag#").mkString(" ") + " " +
      Iterator.fill(4)(
        "the rest of the line does have normal words with it")
        .mkString(" ")),
    // mean word length > 10 -> mwl_ok false
    (9100000005L, Iterator.fill(55)("incomprehensibilities")
      .mkString(" ")),
    // words are digit runs: alpha_ok false (no alphabetic character)
    (9100000006L, Iterator.fill(55)("12345").mkString(" ")),
    // 2 words -> words_ok false
    (9100000007L, "too short"))

  /** Gopher quality filter — the seven A1.1 document rules:
    * word count in [50, 100000]; mean word length in [3, 10]
    * (alnum chars over alnum tokens, the text_quality measure);
    * symbol-to-word ratio ('#', '...', '…') ≤ 0.1; ≤ 90% of lines
    * bullet-initial; ≤ 30% of lines ellipsis-terminal; ≥ 80% of
    * whitespace words contain an alphabetic char; ≥ 2 distinct
    * required stopwords. Emits per-rule flags plus the conjunction,
    * so downstream gates can relax individual rules without
    * re-scanning. */
  val gopher: Q = {
    val stopsSql = gopherStops.map(w => s"'$w'").mkString(", ")
    Q(
      "quality_gopher",
      s"""WITH planted(doc_id, text) AS (VALUES
        |    ${plantedSql(gopherPlanted)}),
        |u AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id, text FROM planted),
        |t AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
        |    len(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS n_alnum,
        |    len(regexp_extract_all(text, '\\S+')) AS n_raw,
        |    len(list_filter(regexp_extract_all(text, '\\S+'),
        |      w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
        |    len(text) - len(replace(text, '#', ''))
        |      + len(regexp_extract_all(text, '\\.\\.\\.'))
        |      + len(text) - len(replace(text, '…', '')) AS n_sym,
        |    len(regexp_extract_all(text, '[^\\n]+')) AS n_lines,
        |    len(list_filter(regexp_extract_all(text, '[^\\n]+'),
        |      l -> regexp_matches(l, '^[ \\t]*[-*•]'))) AS n_bullet,
        |    len(list_filter(regexp_extract_all(text, '[^\\n]+'),
        |      l -> regexp_matches(l, '(\\.\\.\\.|…)$$'))) AS n_ell,
        |    len(list_intersect(
        |      list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')),
        |      [$stopsSql])) AS n_stops
        |  FROM u)
        |SELECT doc_id, n_words, n_lines,
        |  n_words BETWEEN 50 AND 100000 AS words_ok,
        |  3 * n_words <= n_alnum AND n_alnum <= 10 * n_words AS mwl_ok,
        |  10 * n_sym <= n_words AS symbol_ok,
        |  10 * n_bullet <= 9 * n_lines AS bullet_ok,
        |  10 * n_ell <= 3 * n_lines AS ellipsis_ok,
        |  10 * n_alpha >= 8 * n_raw AS alpha_ok,
        |  n_stops >= 2 AS stops_ok,
        |  n_words BETWEEN 50 AND 100000
        |    AND 3 * n_words <= n_alnum AND n_alnum <= 10 * n_words
        |    AND 10 * n_sym <= n_words
        |    AND 10 * n_bullet <= 9 * n_lines
        |    AND 10 * n_ell <= 3 * n_lines
        |    AND 10 * n_alpha >= 8 * n_raw
        |    AND n_stops >= 2 AS keep
        |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val u = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .unionByName(gopherPlanted.toDF("doc_id", "text"))
      gopherFrom(u).orderBy(col("doc_id"))
    }
  }

  /** The Gopher rule dataflow over an arbitrary doc frame — shared by
    * the registered query and the streaming twin (StreamOps
    * .gopherIngest) so the two cannot drift (the qualityFrom rule). */
  private[graft] def gopherFrom(u: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val rawWords = regexp_extract_all(col("text"), lit("\\S+"), lit(0))
      val lines = regexp_extract_all(col("text"), lit("[^\\n]+"), lit(0))
      val t = u.select(
        col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_words"),
        length(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
          .cast("long").as("n_alnum"),
        size(rawWords).cast("long").as("n_raw"),
        size(filter(rawWords, w => w.rlike("[A-Za-z]")))
          .cast("long").as("n_alpha"),
        (length(col("text")) - length(regexp_replace(col("text"), "#", ""))
          + size(regexp_extract_all(col("text"), lit("\\.\\.\\."), lit(0)))
          + length(col("text"))
          - length(regexp_replace(col("text"), "…", "")))
          .cast("long").as("n_sym"),
        size(lines).cast("long").as("n_lines"),
        size(filter(lines, l => l.rlike("^[ \\t]*[-*•]")))
          .cast("long").as("n_bullet"),
        size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$")))
          .cast("long").as("n_ell"),
        size(array_intersect(array_distinct(toks(col("text"))),
          array(gopherStops.map(lit): _*))).cast("long").as("n_stops"))
      val flags = Seq(
        "words_ok" -> (col("n_words") >= 50 && col("n_words") <= 100000),
        "mwl_ok" -> (lit(3) * col("n_words") <= col("n_alnum")
          && col("n_alnum") <= lit(10) * col("n_words")),
        "symbol_ok" -> (lit(10) * col("n_sym") <= col("n_words")),
        "bullet_ok" -> (lit(10) * col("n_bullet") <= lit(9) * col("n_lines")),
        "ellipsis_ok" -> (lit(10) * col("n_ell") <= lit(3) * col("n_lines")),
        "alpha_ok" -> (lit(10) * col("n_alpha") >= lit(8) * col("n_raw")),
        "stops_ok" -> (col("n_stops") >= 2))
      t.select(
        (Seq(col("doc_id"), col("n_words"), col("n_lines")) ++
          flags.map { case (n, c) => c.as(n) } :+
          flags.map(_._2).reduce(_ && _).as("keep")): _*)
  }

  // ---------------------------------------------------------------
  // C4 rules
  // ---------------------------------------------------------------

  /** Planted docs exercising every C4 branch (the salad corpus has no
    * newlines or punctuation, so it uniformly fails the sentence
    * gate — honest under the published rules). */
  private val c4Planted: Seq[(Long, String)] = Seq(
    // clean keeper: 3 lines, each ≥5 words with terminal punctuation
    (9200000001L, Seq(
      "the first line has plenty of words and ends well.",
      "the second line also carries enough words to stay!",
      "does the third line ask a proper question here?").mkString("\n")),
    // mixed: short line, unterminated line and a javascript line all
    // drop; three good sentences remain -> keep with filtered text
    (9200000002L, Seq(
      "tiny line.",
      "this line never terminates so it gets dropped entirely",
      "please enable javascript to view the comments powered here.",
      "the surviving first sentence has the needed words inside.",
      "the surviving second sentence also keeps enough words here.",
      "the surviving third sentence closes out the document now.").mkString("\n")),
    // curly brace anywhere drops the whole doc
    (9200000003L, Seq(
      "the code sample below set things off { badly for this page.",
      "the second sentence is otherwise fine and long enough here.",
      "the third sentence is also fine and long enough to stay.").mkString("\n")),
    // lorem ipsum boilerplate drops the whole doc
    (9200000004L, Seq(
      "Lorem ipsum dolor sit amet consectetur adipiscing elit today.",
      "the second sentence is long enough and ends properly too.",
      "the third sentence is long enough and ends properly too.").mkString("\n")),
    // only two sentences -> dropped by the ≥3-sentence page rule
    (9200000005L, Seq(
      "the first sentence is long enough and ends properly here.",
      "the second sentence is long enough and ends properly too.").mkString("\n")),
    // mid-line punctuation makes sentences but no KEPT lines
    (9200000006L, Seq(
      "what! a strange. layout? with punctuation only mid line",
      "and a second row again with no terminal punctuation at all").mkString("\n")))

  /** C4 page+line filter — line level: keep lines that end in a
    * terminal punctuation mark ('.', '!', '?', '"'), carry ≥ 5
    * whitespace words, and do not mention "javascript"; page level:
    * drop pages containing '{' or "lorem ipsum" or fewer than three
    * sentences (terminal-punct occurrences). Emits the kept-line
    * reconstruction (`cleaned_text`) so the filter IS the transform,
    * plus per-rule columns for relaxation. */
  val c4: Q = Q(
    "quality_c4",
    s"""WITH planted(doc_id, text) AS (VALUES
      |    ${plantedSql(c4Planted)}),
      |u AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id, text FROM planted),
      |t AS (
      |  SELECT doc_id,
      |    len(regexp_extract_all(text, '[^\\n]+')) AS n_lines,
      |    list_filter(regexp_extract_all(text, '[^\\n]+'),
      |      l -> regexp_matches(l, '[.!?"]$$')
      |        AND len(regexp_extract_all(l, '\\S+')) >= 5
      |        AND NOT contains(lower(l), 'javascript')) AS kept,
      |    len(regexp_extract_all(text, '[.!?]')) AS n_sentences,
      |    contains(text, '{') AS has_brace,
      |    contains(lower(text), 'lorem ipsum') AS has_lorem
      |  FROM u)
      |SELECT doc_id, n_lines, len(kept) AS n_kept, n_sentences,
      |  has_brace, has_lorem,
      |  NOT has_brace AND NOT has_lorem AND n_sentences >= 3
      |    AND len(kept) >= 1 AS keep,
      |  COALESCE(array_to_string(kept, chr(10)), '') AS cleaned_text
      |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val u = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .unionByName(c4Planted.toDF("doc_id", "text"))
    val lines = regexp_extract_all(col("text"), lit("[^\\n]+"), lit(0))
    val kept = filter(lines, l =>
      l.rlike("[.!?\"]$") &&
        size(regexp_extract_all(l, lit("\\S+"), lit(0))) >= 5 &&
        !lower(l).contains("javascript"))
    val t = u.select(
      col("doc_id"),
      size(lines).cast("long").as("n_lines"),
      kept.as("kept"),
      size(regexp_extract_all(col("text"), lit("[.!?]"), lit(0)))
        .cast("long").as("n_sentences"),
      col("text").contains("{").as("has_brace"),
      lower(col("text")).contains("lorem ipsum").as("has_lorem"))
    t.select(
      col("doc_id"), col("n_lines"),
      size(col("kept")).cast("long").as("n_kept"), col("n_sentences"),
      col("has_brace"), col("has_lorem"),
      (!col("has_brace") && !col("has_lorem") && col("n_sentences") >= 3
        && size(col("kept")) >= 1).as("keep"),
      array_join(col("kept"), "\n").as("cleaned_text"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // Inter-gate agreement (Cohen's kappa)
  // ---------------------------------------------------------------

  /** Cohen's κ (1960) between the two INDEPENDENT quality gates
    * corpus_clean actually stacks — the learned NB classifier
    * (quality_nb_apply's pred) and the heuristic quality screen
    * (text_quality's score ≥ 0.35, corpus_clean's own threshold) —
    * the label-quality question every curation stack asks before
    * trusting either gate alone ("do my filters even agree, beyond
    * chance?"). Both sides are the REGISTERED dataflows/oracles
    * composed in (the ann_eval rule — the agreement can never drift
    * from what the gates actually compute). The Gopher screen was
    * deliberately NOT chosen as the second rater: on this synthetic
    * corpus it keeps nothing (the salad text has no newlines and
    * fails the word-count band uniformly — quality_gopher's planted
    * fixtures exist for exactly that reason), and κ against a
    * constant rater is 0 by definition — true but uninformative.
    * The 2×2 contingency (both_keep/nb_only/heur_only/both_drop) is
    * exact int64; po, pe, and κ = (n·(a+d) − E)/(n² − E) with
    * E = (a+b)(a+c)+(c+d)(b+d) are each ONE fixed IEEE expression
    * over the exact counts, ROUND(6); a degenerate table (pe = 1)
    * scores κ = 0 by contract.
    *
    * Scale shape: the two gate passes (each one corpus scan — the NB
    * side over the broadcast persisted model) plus ONE doc_id
    * equi-join and a map-side 2×2 count; all arithmetic after on a
    * 1-row frame. */
  val agreement: Q = Q(
    "quality_agreement",
    s"""WITH nb AS (
      |  SELECT doc_id, pred AS p_nb
      |  FROM (${graft.queries.Pipeline.qualityNbApply.oracle.get})),
      |gk AS (
      |  SELECT doc_id,
      |    CASE WHEN quality_score >= 0.35 THEN 1 ELSE 0 END AS p_go
      |  FROM (${graft.queries.Text.quality.oracle.get})),
      |ct AS (
      |  SELECT COUNT(*)::BIGINT AS n,
      |    SUM(CASE WHEN p_nb = 1 AND p_go = 1 THEN 1 ELSE 0 END)
      |      ::BIGINT AS a,
      |    SUM(CASE WHEN p_nb = 1 AND p_go = 0 THEN 1 ELSE 0 END)
      |      ::BIGINT AS b,
      |    SUM(CASE WHEN p_nb = 0 AND p_go = 1 THEN 1 ELSE 0 END)
      |      ::BIGINT AS c,
      |    SUM(CASE WHEN p_nb = 0 AND p_go = 0 THEN 1 ELSE 0 END)
      |      ::BIGINT AS d
      |  FROM nb JOIN gk USING (doc_id)),
      |k AS (
      |  SELECT n, a, b, c, d,
      |    CAST(a + b AS DOUBLE) * (a + c)
      |      + CAST(c + d AS DOUBLE) * (b + d) AS e
      |  FROM ct)
      |SELECT n, a AS both_keep, b AS nb_only, c AS heur_only,
      |  d AS both_drop,
      |  ROUND(CAST(a + d AS DOUBLE) / n, 6) + 0 AS po,
      |  ROUND(e / n / n, 6) + 0 AS pe,
      |  CASE WHEN CAST(n AS DOUBLE) * n - e <> 0 THEN
      |    ROUND((CAST(a + d AS DOUBLE) * n - e)
      |      / (CAST(n AS DOUBLE) * n - e), 6) + 0
      |  ELSE 0 END AS kappa
      |FROM k""".stripMargin) { (s, dir) =>
    val nb = graft.queries.Pipeline.nbScored(s, dir)
      .select(col("doc_id"),
        when(col("score_micro") > 0L, 1L).otherwise(0L).as("p_nb"))
    val gk = graft.queries.Text.quality.run(s, dir)
      .select(col("doc_id"),
        when(col("quality_score") >= 0.35, 1L).otherwise(0L)
          .as("p_go"))
    def cell(nv: Int, gv: Int): Column =
      sum(when(col("p_nb") === nv && col("p_go") === gv, 1L)
        .otherwise(0L))
    val ct = nb.join(gk, "doc_id")
      .agg(count(lit(1)).as("n"), cell(1, 1).as("a"), cell(1, 0).as("b"),
        cell(0, 1).as("c"), cell(0, 0).as("d"))
    val k = ct.withColumn("e",
      (col("a") + col("b")).cast("double") * (col("a") + col("c"))
        + (col("c") + col("d")).cast("double") * (col("b") + col("d")))
    k.select(col("n"), col("a").as("both_keep"), col("b").as("nb_only"),
      col("c").as("heur_only"), col("d").as("both_drop"),
      (round((col("a") + col("d")).cast("double") / col("n"), 6) + 0)
        .as("po"),
      (round(col("e") / col("n") / col("n"), 6) + 0).as("pe"),
      when(col("n").cast("double") * col("n") - col("e") =!= 0,
        round(((col("a") + col("d")).cast("double") * col("n") - col("e"))
          / (col("n").cast("double") * col("n") - col("e")), 6) + 0)
        .otherwise(lit(0d)).as("kappa"))
  }

  val all: Seq[Q] = Seq(gopher, c4, agreement)
}
