package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The ConversaDocs retrieval surface, Spark-first.
  *
  * Reference flow (conversadocs/bones.py:47-87): load → split → embed
  * → vector store → as_retriever(top-k) → "stuff" context → LLM.
  * Here: retrieval is a scored join + windowed top-k; context
  * assembly is an ordered aggregation; the embedder is a
  * deterministic hashing projection (the LLM/embedding-model calls
  * are the only stubbed steps — everything around them is real and
  * distributed). Queries = documents with doc_id < 5, a stand-in for
  * a broadcast query batch.
  */
object Retrieval {

  // codegen'd one-pass twin of regexp_extract_all(lower(c),'[a-z0-9]+')
  private def toks(c: Column): Column = graft.functions.TextExprs.tokens(c)

  /** Shared BM25 oracle CTEs (k1=1.2, b=0.75, Lucene-style idf),
    * split so the scoring chain can run over ANY (query_id, t) term
    * relation — the raw questions (bm25Cte) or qa_pipeline's
    * condensed terms. The formula lives in ONE string. */
  private val bm25Base: String =
    """tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) t
      |  FROM documents),
      |tf AS (SELECT doc_id, t, COUNT(*)::DOUBLE tf FROM tok GROUP BY 1, 2),
      |dl AS (SELECT doc_id, COUNT(*)::DOUBLE dl FROM tok GROUP BY 1),
      |df AS (SELECT t, COUNT(DISTINCT doc_id)::DOUBLE df FROM tok GROUP BY 1),
      |stats AS (
      |  SELECT (SELECT COUNT(*)::DOUBLE FROM documents) n,
      |    (SELECT AVG(dl) FROM dl) avgdl)""".stripMargin

  private def bm25ScoreFor(qtRel: String): String =
    s"""scored AS (
      |  SELECT $qtRel.query_id, tf.doc_id,
      |    SUM(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
      |      * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)))
      |      AS score
      |  FROM $qtRel JOIN tf ON $qtRel.t = tf.t
      |  JOIN df ON tf.t = df.t
      |  JOIN dl ON tf.doc_id = dl.doc_id
      |  CROSS JOIN stats
      |  WHERE tf.doc_id <> $qtRel.query_id
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT query_id, doc_id, score, ROW_NUMBER() OVER (
      |    PARTITION BY query_id
      |    ORDER BY ROUND(score, 4) DESC, doc_id) rn
      |  FROM scored)""".stripMargin

  private val bm25Cte: String =
    s"""$bm25Base,
      |qt AS (
      |  SELECT DISTINCT doc_id AS query_id, t
      |  FROM tok WHERE doc_id < 5),
      |${bm25ScoreFor("qt")}""".stripMargin

  /** Spark side of the shared BM25 top-3 (query_id, doc_id, score, rn). */
  private[graft] def bm25Ranked(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
    val qt = tok.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("t")).distinct()
    bm25RankedFor(s, dir, qt)
  }

  /** BM25 ranking for an arbitrary (query_id, t) query-term frame —
    * the retrieval core shared by the raw-question queries and the
    * history-condensed qa_pipeline. */
  private[graft] def bm25RankedFor(
      s: SparkSession, dir: String, qt: DataFrame): DataFrame = {
    // Four INDEPENDENT scan-pipelines, deliberately: tf/dl/df/stats
    // could all derive from one cached (doc,term,tf) frame — one
    // explode instead of four — but both "obvious" single-pass forms
    // MEASURED SLOWER at sf0.1/local[32] (cached tok frame: +25% bm25,
    // +40% hybrid; cached tf with derived dl/df/stats: bm25 1.9→3.2 s,
    // qa 2.7→5.1 s). The redundant scans run fully parallel across the
    // cores, while a cache serializes its consumers behind the
    // materialization. On a bandwidth-bound cluster the cached form's
    // 4x-lower scan volume can win — re-measure there before flipping.
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
    val tf = tok.groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dl = tok.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("double").as("dl"))
    val df = tok.groupBy(col("t"))
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    val stats = tok.agg(
      countDistinct(col("doc_id")).cast("double").as("n"),
      (count(lit(1)).cast("double") / countDistinct(col("doc_id"))).as("avgdl"))
    bm25RankedOver(qt, tf, dl, df, stats)
  }

  /** BM25 scoring over PRE-BUILT term-statistic frames — the shared
    * core of bm25RankedFor, exposed so retrieval_prf can build
    * tf/dl/df/stats ONCE (cached inside its timed invocation) and
    * feed both scoring passes plus its feedback-weight stage from the
    * same frames (VERDICT r16 #3: the uncached two-pass form computed
    * the whole upstream twice — 52 scans, 142 exchanges). */
  private[graft] def bm25RankedOver(qt: DataFrame, tf: DataFrame,
      dl: DataFrame, df: DataFrame, stats: DataFrame): DataFrame = {
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1)
    val termScore = idf * col("tf") * 2.2 /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    // df pruned to the BOUNDED query-term set before the broadcast:
    // the full-vocabulary df scales with the corpus and must never be
    // a forced build side (the q5_multijoin scaling-side-hint lesson,
    // applied to derived frames). The semi join rides df's existing
    // t-grouping — no extra exchange — and the pruned frame is bounded
    // by the query vocabulary at ANY corpus size. The prune side is
    // THE SAME broadcast(qt) exchange the scorer builds — same
    // canonical subtree, keyed on t in both joins, so it broadcasts
    // ONCE (ReusedExchange). The r16 form broadcast a projected
    // qt.select(t).distinct() instead: a subtree of its own, so the
    // whole qt pipeline evaluated twice per scoring pass — and in
    // retrieval_prf, whose pass-2 qt embeds the ENTIRE pass-1
    // ranking, that duplicated pass 1 wholesale (52 scans / 142
    // exchanges, +78% on the driver — VERDICT r16 #3). left_semi
    // ignores build-side duplicates, so the undeduped qt is
    // join-equivalent.
    val dfQ = df.join(broadcast(qt), Seq("t"), "left_semi")
    val scored = broadcast(qt).join(tf, "t")
      .join(broadcast(dfQ), "t")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(termScore).as("score"))
    // rank on the 4dp grid the scores are PRINTED at (the
    // q_decile_lift rule): a BM25 score is a float sum whose
    // term order differs between engines, so two docs with
    // mathematically equal scores (exact replicas at scale) land
    // ulps apart in engine-dependent order — raw-score ordering
    // flips their ranks (caught by the sf1 gate); on the quantized
    // grid the tie is exact and doc_id breaks it identically
    // everywhere
    scored.withColumn("rn", row_number().over(Window
      .partitionBy(col("query_id"))
      .orderBy(round(col("score"), 4).desc, col("doc_id"))))
  }

  /** avgdl parity note: Spark computes avgdl as total_tokens /
    * n_docs; the oracle's AVG(dl) over per-doc counts is the same
    * value because every document has >= 1 token. */
  val bm25: Q = Q(
    "retrieval_bm25",
    s"""WITH $bm25Cte
      |SELECT query_id, rn AS rank, doc_id, ROUND(score, 4) AS score
      |FROM ranked WHERE rn <= 3 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    bm25Ranked(s, dir)
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("rn").as("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** "Stuff"-chain context assembly (bones.py:80-87): the top-k
    * retrieved documents concatenated in rank order, one context
    * string per query — ordered aggregation after the retrieval join. */
  val context: Q = Q(
    "retrieval_context",
    s"""WITH $bm25Cte
      |SELECT r.query_id,
      |  string_agg(d.text, ' | ' ORDER BY r.rn) AS context
      |FROM ranked r JOIN documents d ON r.doc_id = d.doc_id
      |WHERE r.rn <= 3 GROUP BY r.query_id ORDER BY r.query_id""".stripMargin) { (s, dir) =>
    val top = bm25Ranked(s, dir).filter(col("rn") <= 3)
    top.join(Tables.documents(s, dir), "doc_id")
      .groupBy(col("query_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("text")))),
          x => x("text")), " | ").as("context"))
      .orderBy(col("query_id"))
  }

  /** Map-reduce extractive summarization skeleton (bones.py:146-169):
    * map = score every chunk by how many globally-rare distinct terms
    * it contains (integer-exact, so fully oracle-checkable);
    * reduce = keep top-2 chunks per document. An LLM map-reduce chain
    * swaps the scorer for a model call; the distribution shape —
    * per-chunk map, per-doc top-k reduce — is identical. */
  val summarize: Q = Q(
    "summarize_extractive",
    """WITH ch AS (
      |  SELECT doc_id, i AS chunk_id, substr(text, i * 170 + 1, 200) AS chunk
      |  FROM (SELECT doc_id, text,
      |    unnest(range(0, (len(text) + 169) // 170)) AS i FROM documents)),
      |tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) t
      |  FROM documents),
      |df AS (SELECT t, COUNT(DISTINCT doc_id) df FROM tok GROUP BY 1),
      |ndocs AS (SELECT COUNT(*) n FROM documents),
      |rare AS (
      |  SELECT ct.doc_id, ct.chunk_id, COUNT(DISTINCT ct.t) AS n_rare
      |  FROM (SELECT doc_id, chunk_id, unnest(list_distinct(
      |      regexp_extract_all(lower(chunk), '[a-z0-9]+'))) t
      |    FROM ch) ct
      |  JOIN df ON ct.t = df.t
      |  CROSS JOIN ndocs
      |  WHERE df.df <= ndocs.n / 10
      |  GROUP BY 1, 2),
      |cs AS (
      |  SELECT ch.doc_id, ch.chunk_id, ch.chunk, COALESCE(r.n_rare, 0) AS n_rare
      |  FROM ch LEFT JOIN rare r
      |    ON ch.doc_id = r.doc_id AND ch.chunk_id = r.chunk_id),
      |r AS (
      |  SELECT doc_id, chunk_id, chunk, n_rare, ROW_NUMBER() OVER (
      |    PARTITION BY doc_id ORDER BY n_rare DESC, chunk_id) rn
      |  FROM cs)
      |SELECT doc_id, rn AS rank, chunk_id, n_rare, chunk
      |FROM r WHERE rn <= 2 ORDER BY doc_id, rank""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val ch = docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          floor((length(col("text")) - 1) / 170).cast("int"))).as("i"))
      .select(col("doc_id"), col("i").cast("long").as("chunk_id"),
        col("text").substr(col("i") * 170 + 1, lit(200)).as("chunk"))
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("t"))
    val df = tok.groupBy(col("t")).agg(countDistinct(col("doc_id")).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val ct = ch.select(col("doc_id"), col("chunk_id"),
      explode(array_distinct(toks(col("chunk")))).as("t"))
    // no broadcast hint on df: it is the full corpus vocabulary (the
    // chunk terms span the whole corpus, so no bounded pruning set
    // exists) — AQE broadcasts while it is small and degrades to a
    // shuffle join at scale instead of an OOM build side
    val rare = ct.join(df, "t")
      .crossJoin(broadcast(nDocs))
      .filter(col("df") <= col("n") / 10)
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(countDistinct(col("t")).as("n_rare"))
    val cs = ch.join(rare, Seq("doc_id", "chunk_id"), "left")
      .withColumn("n_rare", coalesce(col("n_rare"), lit(0L)))
    cs.withColumn("rn", row_number().over(Window
        .partitionBy(col("doc_id"))
        .orderBy(col("n_rare").desc, col("chunk_id"))))
      .filter(col("rn") <= 2)
      .select(col("doc_id"), col("rn").as("rank"), col("chunk_id"),
        col("n_rare"), col("chunk"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Conversational state machine over the events log (bones.py:
    * 123-144, 275-277): chat history accrues per user in timestamp
    * order; a 'signup' event clears it (clr_history). history_len is
    * the number of messages since the last clear — one window pass,
    * no driver state, any number of users. */
  val conversationReplay: Q = Q(
    "conversation_replay",
    """WITH x AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS epoch
      |  FROM events)
      |SELECT user_id, event_id, ts, event_type,
      |  ROW_NUMBER() OVER (PARTITION BY user_id, epoch
      |    ORDER BY ts, event_id) - 1 AS history_len
      |FROM x ORDER BY user_id, ts, event_id""".stripMargin) { (s, dir) =>
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("epoch",
        sum(when(col("event_type") === "signup", 1).otherwise(0))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("history_len", row_number().over(Window
        .partitionBy(col("user_id"), col("epoch"))
        .orderBy(col("ts"), col("event_id"))) - 1)
      .drop("epoch")
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Shared oracle CTEs for the hashing embedder: raw (unnormalized)
    * bucket weights per doc. Portable md5-prefix token hash (same
    * engine-pair trick as text_fingerprint, Text.scala): 40-bit
    * non-negative, so `%` / `>>` / `&` agree between engines and the
    * weights are exact integers. */
  /** tok-free embedder fragment: hh/wts from an existing `tok` CTE —
    * composable after bm25Cte (which defines its own identical tok),
    * so the hash width / bucket count / sign bit live in ONE string. */
  private val embedFromTok: String =
    """hh AS (
      |  SELECT doc_id, ('0x' || substr(md5(t), 1, 10))::BIGINT AS h FROM tok),
      |wts AS (
      |  SELECT doc_id, CAST(h % 64 AS INT) AS idx,
      |    CAST(SUM(CASE WHEN (h >> 6) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS w
      |  FROM hh GROUP BY 1, 2)""".stripMargin

  private val embedCte: String =
    s"""tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) t
      |  FROM documents),
      |$embedFromTok""".stripMargin

  /** Deterministic hashing embedder (the batch stand-in for bones.py:71
    * HuggingFaceEmbeddings): token -> bucket h % 64, sign from bit 6,
    * signed counts accumulated per bucket. Emitted long-form
    * (doc_id, idx, w) — exact integers, fully DuckDB-oracle-checked;
    * the dense L2-normalized array contract lives in embeddedDocs
    * (RetrievalSpec). A real model swaps in via mapPartitions with the
    * same (id, Array[Float]) contract. */
  val embedHashing: Q = Q(
    "embed_hashing",
    s"""WITH $embedCte
      |SELECT doc_id, idx, w FROM wts ORDER BY doc_id, idx""".stripMargin) { (s, dir) =>
    rawBuckets(Tables.documents(s, dir))
      .orderBy(col("doc_id"), col("idx"))
  }

  /** Long-form raw bucket weights (doc_id, idx, w: bigint). */
  private def rawBuckets(docs: DataFrame): DataFrame = {
    val h = conv(substring(md5(col("t")), 1, 10), 16, 10).cast("long")
    docs
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
      .select(col("doc_id"), h.as("h"))
      .select(col("doc_id"),
        pmod(col("h"), lit(64)).cast("int").as("idx"),
        when(shiftright(col("h"), 6).bitwiseAND(1) === 1, 1L)
          .otherwise(-1L).as("sgn"))
      .groupBy(col("doc_id"), col("idx"))
      .agg(sum(col("sgn")).as("w"))
  }

  /** (doc_id, vec: array<double>) dense 64-dim RAW weights — exact
    * integers, so dot products and norms are order-independent. */
  private[graft] def embeddedDocsRaw(docs: DataFrame): DataFrame = {
    val asMap = rawBuckets(docs).groupBy(col("doc_id"))
      .agg(map_from_entries(
        collect_list(struct(col("idx"), col("w").cast("double")))).as("m"))
    asMap.select(col("doc_id"),
      transform(sequence(lit(0), lit(63)),
        i => coalesce(try_element_at(col("m"), i), lit(0.0))).as("vec"))
  }

  /** (doc_id, vec: array<double> L2-normalized) for any (doc_id, text) DF. */
  private[graft] def embeddedDocs(
      s: SparkSession, dir: String, docs: DataFrame): DataFrame = {
    val raws = embeddedDocsRaw(docs)
    // materialize vec as an attribute first: HOF lambdas re-evaluate
    // their argument expression per element
    val nrm = sqrt(aggregate(transform(col("vec"), x => x * x),
      lit(0.0), (a, x) => a + x))
    raws.select(col("doc_id"),
      when(nrm > 0, transform(col("vec"), x => x / nrm))
        .otherwise(col("vec")).as("vec"))
  }

  /** End-to-end vector retrieval (load → embed → top-k cosine), the
    * as_retriever(search_type="similarity", k=3) equivalent
    * (bones.py:77-87). Query docs and corpus share the embedder;
    * query side broadcast. Cosine = exact integer dot / sqrt of exact
    * integer norms — bit-stable across engines, so fully
    * oracle-checked (the half-up rounding uses FLOOR(x*1e4+0.5), not
    * round(), to dodge decimal-vs-float rint divergence). */
  val retrievalVector: Q = Q(
    "retrieval_vector",
    s"""WITH $embedCte,
      |n2 AS (SELECT doc_id, SUM(w * w) AS n2 FROM wts GROUP BY 1),
      |pairs AS (
      |  SELECT q.doc_id AS query_id, c.doc_id AS hit_id
      |  FROM (SELECT doc_id FROM documents WHERE doc_id < 5) q
      |  CROSS JOIN (SELECT doc_id FROM documents) c
      |  WHERE c.doc_id <> q.doc_id),
      |dots0 AS (
      |  SELECT a.doc_id AS query_id, b.doc_id AS hit_id, SUM(a.w * b.w) AS dt
      |  FROM wts a JOIN wts b ON a.idx = b.idx
      |  WHERE a.doc_id < 5 AND b.doc_id <> a.doc_id GROUP BY 1, 2),
      |cs AS (
      |  SELECT p.query_id, p.hit_id,
      |    COALESCE(d.dt, 0) / sqrt(na.n2 * nb.n2) AS cos
      |  FROM pairs p
      |  LEFT JOIN dots0 d ON p.query_id = d.query_id AND p.hit_id = d.hit_id
      |  JOIN n2 na ON na.doc_id = p.query_id
      |  JOIN n2 nb ON nb.doc_id = p.hit_id),
      |r AS (
      |  SELECT query_id, hit_id, cos, ROW_NUMBER() OVER (
      |    PARTITION BY query_id ORDER BY cos DESC, hit_id) rn FROM cs)
      |SELECT query_id, rn AS rank, hit_id,
      |  FLOOR(cos * 10000 + 0.5) / 10000 AS cos_sim
      |FROM r WHERE rn <= 3 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    // cache: both the query side and the corpus side read the embedded
    // docs; uncached, the full embed pipeline runs twice
    val emb = embeddedDocsRaw(Tables.documents(s, dir)).cache()
    import graft.functions.VectorExprs.{dot, norm2}
    val q = emb.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("vec").as("vq"))
      .withColumn("nq", norm2(col("vq")))
    val c = emb.select(col("doc_id").as("hit_id"), col("vec").as("vc"))
      .withColumn("nc", norm2(col("vc")))
    val cos = dot(col("vq"), col("vc")) / sqrt(col("nq") * col("nc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("hit_id"))
    broadcast(q).join(c, col("hit_id") =!= col("query_id"))
      .withColumn("cos", cos)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("rn").as("rank"), col("hit_id"),
        (floor(col("cos") * 10000 + 0.5) / 10000).as("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Multi-format file ingestion (bones.py:32-64): loads the
    * reference's own demo_docs directory through the
    * extension-dispatched DocLoader. Rows-only (file-system input,
    * not a lake table); format handling spec'd in RetrievalSpec. */
  val docLoadFiles: Q = Q.rowsOnly("doc_load_files") { (s, _) =>
    graft.sources.DocLoader.load(s, "/root/reference/demo_docs")
      .orderBy(col("source"))
  }

  /** History-aware question condensation — the deterministic stand-in
    * for ConversationalRetrievalChain's condense step (bones.py:80-87,
    * 135-142: qa({"question", "chat_history"}) rewrites the query
    * BEFORE retrieval and surfaces it as result["generated_question"]).
    * Chat history here is the session's earlier turns (the questions
    * of lower-id query docs, last 2 turns); the rewrite appends the
    * up-to-3 RAREST history terms (corpus df ascending — the most
    * informative ones) not already present in the question. Returns
    * (query_id, question, condensed_question) and the condensed
    * (query_id, t) term set that retrieval actually runs on. */
  private[graft] def condensedQueries(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(s, dir)
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("t"))
    val questions = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(toks(col("text")), 1, 10)).as("question"))
    val qTerms = questions
      .select(col("query_id"), explode(toks(col("question"))).as("t"))
      .distinct()
    val turns = questions
      .select(col("query_id").as("h"), col("question").as("h_question"))
    val histTerms = questions.join(turns,
        col("h") < col("query_id") && col("h") >= col("query_id") - 2)
      .select(col("query_id"), explode(toks(col("h_question"))).as("t"))
      .distinct()
      .join(qTerms, Seq("query_id", "t"), "left_anti") // new terms only
    val dfr = tok.select(col("doc_id"), col("t")).distinct()
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
    val picked = histTerms.join(dfr, "t")
      .withColumn("rk", row_number().over(Window
        .partitionBy(col("query_id")).orderBy(col("df"), col("t"))))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("t"))
    val addon = picked.groupBy(col("query_id"))
      .agg(concat_ws(" ", array_sort(collect_list(col("t")))).as("addon"))
    val condQ = questions.join(addon, Seq("query_id"), "left")
      .select(col("query_id"), col("question"),
        when(col("addon").isNull, col("question"))
          .otherwise(concat_ws(" ", col("question"), col("addon")))
          .as("condensed_question"))
    (condQ, qTerms.unionByName(picked))
  }

  /** The whole conversational QA pipeline in one plan (bones.py:
    * 123-144 convchain): question + chat history → condensed query
    * (mirrors result["generated_question"]) → BM25 retrieve on the
    * CONDENSED terms → stuff top-2 context → extractive answer stub
    * from the top hit (the LLM call is the only stubbed step).
    *
    * ORACLE-CHECKED end-to-end: every stage is deterministic string /
    * integer / ranking arithmetic — question formatting (first-10
    * tokens), the rare-term condensation (df-ascending argmax), the
    * BM25 chain over the condensed terms (bm25ScoreFor — the same
    * formula string the proven retrieval_bm25 oracle uses), context
    * stuffing, and the answer stub. History influence and shape stay
    * asserted in RetrievalSpec. */
  val qaPipeline: Q = Q(
    "qa_pipeline",
    s"""WITH $bm25Base,
      |tv AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') ts
      |  FROM documents),
      |q AS (
      |  SELECT doc_id AS query_id,
      |    array_to_string(ts[1:10], ' ') AS question, ts[1:10] AS qts
      |  FROM tv WHERE doc_id < 5),
      |qt0 AS (
      |  SELECT DISTINCT query_id, t FROM (
      |    SELECT query_id, unnest(qts) AS t FROM q)),
      |ht AS (
      |  SELECT DISTINCT query_id, t FROM (
      |    SELECT cur.query_id, unnest(h.qts) AS t
      |    FROM q cur JOIN q h ON h.query_id < cur.query_id
      |      AND h.query_id >= cur.query_id - 2)),
      |htn AS (
      |  SELECT ht.query_id, ht.t FROM ht
      |  WHERE NOT EXISTS (SELECT 1 FROM qt0
      |    WHERE qt0.query_id = ht.query_id AND qt0.t = ht.t)),
      |picked AS (
      |  SELECT query_id, t FROM (
      |    SELECT htn.query_id, htn.t,
      |      ROW_NUMBER() OVER (PARTITION BY htn.query_id
      |        ORDER BY df.df, htn.t) rk
      |    FROM htn JOIN df ON df.t = htn.t)
      |  WHERE rk <= 3),
      |addon AS (
      |  SELECT query_id, string_agg(t, ' ' ORDER BY t) AS addon
      |  FROM picked GROUP BY 1),
      |condq AS (
      |  SELECT q.query_id, q.question,
      |    CASE WHEN a.addon IS NULL THEN q.question
      |         ELSE q.question || ' ' || a.addon END AS condensed_question
      |  FROM q LEFT JOIN addon a USING (query_id)),
      |cqt AS (
      |  SELECT query_id, t FROM qt0
      |  UNION ALL SELECT query_id, t FROM picked),
      |${bm25ScoreFor("cqt")},
      |top2 AS (
      |  SELECT r.query_id, r.rn, d.doc_id, d.text
      |  FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
      |  WHERE r.rn <= 2),
      |ctx AS (
      |  SELECT query_id, string_agg(text, ' | ' ORDER BY rn) AS context
      |  FROM top2 GROUP BY 1),
      |ans AS (
      |  SELECT query_id, doc_id AS top_doc, substr(text, 1, 120) AS answer
      |  FROM top2 WHERE rn = 1)
      |SELECT c.query_id, c.question, c.condensed_question,
      |  a.top_doc, a.answer, x.context
      |FROM condq c JOIN ctx x USING (query_id) JOIN ans a USING (query_id)
      |ORDER BY query_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val (condQ, condQt) = condensedQueries(s, dir)
    val ranked = bm25RankedFor(s, dir, condQt).filter(col("rn") <= 2)
    val withText = ranked.join(docs, "doc_id")
    val ctx = withText.groupBy(col("query_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("text")))),
          x => x("text")), " | ").as("context"))
    val answer = withText.filter(col("rn") === 1)
      .select(col("query_id"), col("doc_id").as("top_doc"),
        substring(col("text"), 1, 120).as("answer"))
    broadcast(condQ)
      .join(ctx, "query_id").join(answer, "query_id")
      .select(col("query_id"), col("question"), col("condensed_question"),
        col("top_doc"), col("answer"), col("context"))
      .orderBy(col("query_id"))
  }

  /** Hybrid retrieval — the standard modern RAG pattern the reference's
    * pure-vector as_retriever predates: BM25 generates top-10 lexical
    * candidates, the dense (hashing-embedder) cosine re-scores them,
    * and the final rank mixes the two signals equally (BM25 min-maxed
    * per query by its top score). Candidate generation is the cheap
    * lexical join; the expensive dense scoring touches only 10 pairs
    * per query — the shape that survives 100 TB (only candidate docs
    * are embedded; the corpus is semi-joined down first). The cosine
    * half is integer-exact; the BM25 half is the same double
    * expression tree on both engines (the retrieval_bm25 parity
    * precedent) — near-ties between two candidates could in principle
    * land on opposite sides of the rank boundary if engines ever sum
    * the per-term scores to different low bits. */
  val hybrid: Q = Q(
    "retrieval_hybrid",
    s"""WITH $bm25Cte,
      |$embedFromTok,
      |n2 AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2 FROM wts GROUP BY 1),
      |cand AS (
      |  SELECT query_id, doc_id AS hit_id, ROUND(score, 4) AS score
      |  FROM ranked WHERE rn <= 10),
      |dt AS (
      |  SELECT c.query_id, c.hit_id, CAST(SUM(a.w * b.w) AS BIGINT) AS dt
      |  FROM cand c JOIN wts a ON a.doc_id = c.query_id
      |  JOIN wts b ON b.doc_id = c.hit_id AND a.idx = b.idx
      |  GROUP BY 1, 2),
      |mx AS (SELECT query_id, MAX(score) AS m FROM cand GROUP BY 1),
      |hy AS (
      |  SELECT c.query_id, c.hit_id,
      |    0.5 * (c.score / mx.m)
      |      + 0.5 * (COALESCE(dt.dt, 0) / sqrt(na.n2 * nb.n2)) AS hybrid
      |  FROM cand c JOIN mx ON c.query_id = mx.query_id
      |  LEFT JOIN dt ON dt.query_id = c.query_id AND dt.hit_id = c.hit_id
      |  JOIN n2 na ON na.doc_id = c.query_id
      |  JOIN n2 nb ON nb.doc_id = c.hit_id),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY hybrid DESC, hit_id) rn FROM hy)
      |SELECT query_id, rn AS rank, hit_id,
      |  FLOOR(hybrid * 10000 + 0.5) / 10000 AS hybrid_score
      |FROM r WHERE rn <= 3 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    // the BM25 half enters the mix on its 4dp grid (the bm25 rank
    // rule): with quantized lexical scores and exact-integer cosines,
    // the hybrid value is the same double expression tree on both
    // engines — no sum-order freedom left for near-ties to exploit
    val cand = bm25Ranked(s, dir).filter(col("rn") <= 10)
      .select(col("query_id"), col("doc_id").as("hit_id"),
        round(col("score"), 4).as("score"))
      .cache() // consumed by the dot join, the max, the doc-id set, and the mix
    cand.count() // materialize NOW: the embedder subtree depends on cand
    // (via the candidate-doc semi join), so without an eager fill the
    // lexical pipeline would re-execute once per downstream consumer
    // embed ONLY the docs that appear in a candidate pair: the corpus
    // is semi-joined down before tokenize/hash/groupBy ever run
    val candDocs = cand.select(col("query_id").as("doc_id"))
      .unionByName(cand.select(col("hit_id").as("doc_id"))).distinct()
    val wts = rawBuckets(Tables.documents(s, dir)
      .join(broadcast(candDocs), Seq("doc_id"), "left_semi")).cache()
    val n2 = wts.groupBy(col("doc_id")).agg(sum(col("w") * col("w")).as("n2"))
    val dt = cand.select(col("query_id"), col("hit_id"))
      .join(wts.select(col("doc_id").as("query_id"), col("idx"),
        col("w").as("wa")), "query_id")
      .join(wts.select(col("doc_id").as("hit_id"), col("idx"),
        col("w").as("wb")), Seq("hit_id", "idx"))
      .groupBy(col("query_id"), col("hit_id"))
      .agg(sum(col("wa") * col("wb")).as("dt"))
    val mx = cand.groupBy(col("query_id")).agg(max(col("score")).as("m"))
    val hybridCol = lit(0.5) * (col("score") / col("m")) +
      lit(0.5) * (coalesce(col("dt"), lit(0L)) / sqrt(col("na") * col("nb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hybrid").desc, col("hit_id"))
    cand.join(mx, "query_id")
      .join(dt, Seq("query_id", "hit_id"), "left")
      .join(n2.select(col("doc_id").as("query_id"), col("n2").as("na")), "query_id")
      .join(n2.select(col("doc_id").as("hit_id"), col("n2").as("nb")), "hit_id")
      .withColumn("hybrid", hybridCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("rn").as("rank"), col("hit_id"),
        (floor(col("hybrid") * 10000 + 0.5) / 10000).as("hybrid_score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Reciprocal-rank fusion — the other standard lexical+dense
    * combiner next to retrieval_hybrid's score mixing: rrf(d) =
    * Σ_systems 1/(60+rank_d), rank-only so the two systems' score
    * scales never need calibrating. Composed from the registered
    * bm25 and dense retrievals (same dataflow, oracle embeds their
    * oracle SQL), full-outer on (query, doc) so a doc ranked by only
    * one system still scores. 1/(60+r) on ranks 1..3 is a sum of two
    * exactly-representable-denominator divisions — IEEE-identical
    * across engines. */
  val rrf: Q = Q(
    "retrieval_rrf",
    s"""WITH lex AS (
      |  SELECT query_id, doc_id, rank AS rb FROM (${bm25.oracle.get})),
      |den AS (
      |  SELECT query_id, hit_id AS doc_id, rank AS rv
      |  FROM (${retrievalVector.oracle.get})),
      |fused AS (
      |  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
      |    COALESCE(l.doc_id, d.doc_id) AS doc_id,
      |    COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.rb), 0.0)
      |      + COALESCE(CAST(1.0 AS DOUBLE) / (60 + d.rv), 0.0) AS rrf
      |  FROM lex l FULL OUTER JOIN den d
      |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id),
      |r AS (
      |  SELECT query_id, doc_id, rrf, ROW_NUMBER() OVER (
      |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) rn
      |  FROM fused)
      |SELECT query_id, rn AS rank, doc_id,
      |  FLOOR(rrf * 1000000 + 0.5) / 1000000 AS rrf_score
      |FROM r ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    val lex = bm25.run(s, dir)
      .select(col("query_id"), col("doc_id"), col("rank").as("rb"))
    val den = retrievalVector.run(s, dir)
      .select(col("query_id"), col("hit_id").as("doc_id"),
        col("rank").as("rv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    lex.join(den, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (col("rb") + 60), lit(0.0))
          + coalesce(lit(1.0) / (col("rv") + 60), lit(0.0)))
      .withColumn("rn", row_number().over(w))
      .select(col("query_id"), col("rn").as("rank"), col("doc_id"),
        (floor(col("rrf") * 1000000 + 0.5) / 1000000).as("rrf_score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** One MMR candidate: lexical relevance + dense vector. */
  final case class MmrCand(query_id: Long, doc_id: Long, rel: Double,
      vec: Seq[Double])
  final case class MmrPick(query_id: Long, rank: Int, doc_id: Long,
      mmr_score: Double)

  /** Maximal-marginal-relevance re-ranking — the diversification pass
    * between retrieval and context stuffing: greedily pick k docs
    * maximizing λ·relevance − (1−λ)·max-similarity-to-already-picked,
    * so the stuffed context stops repeating the same passage. The
    * greedy loop is inherently sequential PER QUERY but bounded by
    * the candidate count (10), so it runs as flatMapGroups over
    * query_id groups — the same bounded-buffer pattern as seq_pack;
    * queries parallelize freely, candidates never leave their
    * executor. Relevance is min-maxed by the query's top score
    * (retrieval_hybrid's convention); similarity is the exact
    * integer-weight cosine.
    *
    * ORACLE-CHECKED: a greedy loop has no general SQL twin, but k is
    * FIXED at 3, so the loop UNROLLS into three argmax CTEs (p1→p3),
    * each picking max(score desc, doc_id asc) over the survivors with
    * the similarity penalty against the picks so far. The inter-doc
    * cosines are exact-integer arithmetic (hashing-embedder weights),
    * so they replay bit-for-bit; the BM25 relevances reuse the proven
    * bm25Cte; (1 - 0.7) is written COMPUTED in both engines (the
    * double literal 0.3 differs from 1-0.7 in the last ulp); rounding
    * is the sign-aware FLOOR formula both sides share. RetrievalSpec
    * keeps the sequential-replay, determinism, and diversity gates. */
  val mmr: Q = Q(
    "retrieval_mmr",
    s"""WITH $bm25Cte,
      |$embedFromTok,
      |cand AS (
      |  SELECT query_id, doc_id, ROUND(score, 4) AS score
      |  FROM ranked WHERE rn <= 10),
      |mx AS (
      |  SELECT query_id, GREATEST(MAX(score), 1e-12) AS mrel
      |  FROM cand GROUP BY 1),
      |n2 AS (SELECT doc_id, SUM(w * w) AS n2 FROM wts GROUP BY 1),
      |dots0 AS (
      |  SELECT c1.query_id, c1.doc_id AS da, c2.doc_id AS db,
      |    SUM(a.w * b.w) AS dt
      |  FROM cand c1 JOIN cand c2 ON c1.query_id = c2.query_id
      |    AND c1.doc_id <> c2.doc_id
      |  JOIN wts a ON a.doc_id = c1.doc_id
      |  JOIN wts b ON b.doc_id = c2.doc_id AND a.idx = b.idx
      |  GROUP BY 1, 2, 3),
      |cosim AS (
      |  SELECT c1.query_id, c1.doc_id AS da, c2.doc_id AS db,
      |    CASE WHEN na.n2 = 0 OR nb.n2 = 0 THEN 0.0
      |         ELSE COALESCE(d.dt, 0) / sqrt(na.n2 * nb.n2) END AS cos
      |  FROM cand c1 JOIN cand c2 ON c1.query_id = c2.query_id
      |    AND c1.doc_id <> c2.doc_id
      |  LEFT JOIN dots0 d ON d.query_id = c1.query_id
      |    AND d.da = c1.doc_id AND d.db = c2.doc_id
      |  JOIN n2 na ON na.doc_id = c1.doc_id
      |  JOIN n2 nb ON nb.doc_id = c2.doc_id),
      |p1 AS (
      |  SELECT query_id, doc_id, sc FROM (
      |    SELECT c.query_id, c.doc_id,
      |      0.7 * (c.score / mx.mrel) - (1 - 0.7) * 0.0 AS sc,
      |      ROW_NUMBER() OVER (PARTITION BY c.query_id ORDER BY
      |        0.7 * (c.score / mx.mrel) - (1 - 0.7) * 0.0 DESC, c.doc_id) rn
      |    FROM cand c JOIN mx USING (query_id))
      |  WHERE rn = 1),
      |p2 AS (
      |  SELECT query_id, doc_id, sc FROM (
      |    SELECT c.query_id, c.doc_id,
      |      0.7 * (c.score / mx.mrel) - (1 - 0.7) * cs1.cos AS sc,
      |      ROW_NUMBER() OVER (PARTITION BY c.query_id ORDER BY
      |        0.7 * (c.score / mx.mrel) - (1 - 0.7) * cs1.cos DESC,
      |        c.doc_id) rn
      |    FROM cand c JOIN mx USING (query_id)
      |    JOIN p1 ON p1.query_id = c.query_id AND c.doc_id <> p1.doc_id
      |    JOIN cosim cs1 ON cs1.query_id = c.query_id
      |      AND cs1.da = c.doc_id AND cs1.db = p1.doc_id)
      |  WHERE rn = 1),
      |p3 AS (
      |  SELECT query_id, doc_id, sc FROM (
      |    SELECT c.query_id, c.doc_id,
      |      0.7 * (c.score / mx.mrel)
      |        - (1 - 0.7) * GREATEST(cs1.cos, cs2.cos) AS sc,
      |      ROW_NUMBER() OVER (PARTITION BY c.query_id ORDER BY
      |        0.7 * (c.score / mx.mrel)
      |          - (1 - 0.7) * GREATEST(cs1.cos, cs2.cos) DESC, c.doc_id) rn
      |    FROM cand c JOIN mx USING (query_id)
      |    JOIN p1 ON p1.query_id = c.query_id AND c.doc_id <> p1.doc_id
      |    JOIN p2 ON p2.query_id = c.query_id AND c.doc_id <> p2.doc_id
      |    JOIN cosim cs1 ON cs1.query_id = c.query_id
      |      AND cs1.da = c.doc_id AND cs1.db = p1.doc_id
      |    JOIN cosim cs2 ON cs2.query_id = c.query_id
      |      AND cs2.da = c.doc_id AND cs2.db = p2.doc_id)
      |  WHERE rn = 1),
      |allp AS (
      |  SELECT query_id, 1 AS rank, doc_id, sc FROM p1
      |  UNION ALL SELECT query_id, 2, doc_id, sc FROM p2
      |  UNION ALL SELECT query_id, 3, doc_id, sc FROM p3)
      |SELECT query_id, rank, doc_id,
      |  CASE WHEN sc >= 0 THEN FLOOR(sc * 10000 + 0.5) / 10000
      |       ELSE -(FLOOR(-sc * 10000 + 0.5) / 10000) END AS mmr_score
      |FROM allp ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    import s.implicits._
    val lambda = 0.7
    val k = 3
    // relevance enters the greedy objective on the 4dp grid (the
    // bm25 rank rule): raw float sums would put mathematically-tied
    // replica candidates ulps apart in engine-dependent order and
    // flip the argmax
    val cand = bm25Ranked(s, dir).filter(col("rn") <= 10)
      .select(col("query_id"), col("doc_id"),
        round(col("score"), 4).as("score")).cache()
    cand.count() // eager: the embed subtree below depends on cand
    val candDocs = cand.select(col("doc_id")).distinct()
    val emb = embeddedDocsRaw(Tables.documents(s, dir)
      .join(broadcast(candDocs), Seq("doc_id"), "left_semi"))
    cand.join(emb, "doc_id")
      .select(col("query_id"), col("doc_id"), col("score").as("rel"),
        col("vec"))
      .as[MmrCand]
      .groupByKey(_.query_id)
      .flatMapGroups { (qid: Long, it: Iterator[MmrCand]) =>
        val cs = it.toArray.sortBy(c => (-c.rel, c.doc_id)) // bounded: <= 10
        val maxRel = cs.headOption.map(_.rel).getOrElse(1.0) max 1e-12
        def cos(a: Seq[Double], b: Seq[Double]): Double = {
          var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
          }
          if (na == 0 || nb == 0) 0.0 else dp / math.sqrt(na * nb)
        }
        val picked = scala.collection.mutable.ArrayBuffer.empty[MmrCand]
        val out = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
        while (picked.length < k && picked.length < cs.length) {
          var best: MmrCand = null
          var bestScore = Double.NegativeInfinity
          cs.foreach { c =>
            if (!picked.exists(_.doc_id == c.doc_id)) {
              val sim = if (picked.isEmpty) 0.0
                else picked.map(p => cos(c.vec, p.vec)).max
              val sc = lambda * (c.rel / maxRel) - (1 - lambda) * sim
              // deterministic argmax: strictly-better, or tie → lower id
              if (sc > bestScore ||
                  (sc == bestScore && best != null && c.doc_id < best.doc_id)) {
                best = c; bestScore = sc
              }
            }
          }
          picked += best
          // half-AWAY-FROM-ZERO in pure double arithmetic (MMR scores
          // go negative when the similarity penalty exceeds normalized
          // relevance; plain floor(x*1e4+.5) rounds those toward +inf,
          // and BigDecimal/round() can diverge from an engine's
          // float-scaled rounding at .00005 boundaries — the same
          // decimal-vs-float trap retrieval_vector dodges): mirror the
          // oracle's CASE/FLOOR formula exactly
          val r4 = if (bestScore >= 0)
            math.floor(bestScore * 10000 + 0.5) / 10000
          else -(math.floor(-bestScore * 10000 + 0.5) / 10000)
          out += MmrPick(qid, picked.length, best.doc_id, r4)
        }
        out.iterator
      }
      .toDF()
      .orderBy(col("query_id"), col("rank"))
  }

  /** Late-interaction re-ranking (the ColBERT MaxSim shape): instead
    * of one vector per document, every TERM carries its own small
    * embedding, and score(q, d) = Σ_{t∈q} qtf_t · max_{u∈d} cos(e_t,
    * e_u) — query terms each find their best-matching document term,
    * so partial/semantic matches score where single-vector cosine
    * averages them away. Token embeddings here are the deterministic
    * hashing stand-in (8 md5 nibbles, centered to [-8,7] — integer
    * vectors, exact dots/norms) with the same swap-in contract as
    * embed_hashing: a real ColBERT checkpoint replaces the vocab
    * frame, nothing else moves.
    *
    * Scale shape — the reason late interaction is viable at 100 TB:
    * the corpus is BM25-semi-joined down to 10 candidates per query
    * BEFORE any token-level work (candidate generation stays the
    * cheap inverted-index join), embeddings attach at VOCAB level via
    * a broadcast join on the term, and the quadratic token-pair work
    * is confined to |q|·|d| per candidate pair with the dot computed
    * in-row (zip_with + aggregate over the two arrays — no third
    * join, no shuffle on the embedding dimension). The oracle
    * recomputes the same integers long-form. */
  val maxsim: Q = Q(
    "retrieval_maxsim",
    s"""WITH $bm25Cte,
      |cand AS (
      |  SELECT query_id, doc_id AS hit_id FROM ranked WHERE rn <= 10),
      |needed AS (
      |  SELECT DISTINCT query_id AS doc_id FROM cand
      |  UNION SELECT DISTINCT hit_id FROM cand),
      |terms AS (
      |  SELECT tok.doc_id, t, COUNT(*)::BIGINT AS ctf
      |  FROM tok JOIN needed USING (doc_id) GROUP BY 1, 2),
      |vocab AS (SELECT DISTINCT t FROM terms),
      |emb AS (
      |  SELECT t, j, ('0x' || substr(md5(t), j, 1))::INT - 8 AS v
      |  FROM vocab CROSS JOIN (SELECT unnest(range(1, 9)) AS j)),
      |tn2 AS (SELECT t, CAST(SUM(v * v) AS BIGINT) AS n2 FROM emb GROUP BY 1),
      |qterms AS (
      |  SELECT c.query_id, c.hit_id, tq.t AS qt, tq.ctf
      |  FROM cand c JOIN terms tq ON tq.doc_id = c.query_id),
      |dterms AS (
      |  SELECT c.query_id, c.hit_id, td.t AS dtt
      |  FROM cand c JOIN terms td ON td.doc_id = c.hit_id),
      |pp AS (
      |  SELECT q.query_id, q.hit_id, q.qt, q.ctf, d.dtt
      |  FROM qterms q JOIN dterms d USING (query_id, hit_id)),
      |dots AS (
      |  SELECT query_id, hit_id, qt, ctf, dtt,
      |    CAST(SUM(ea.v * eb.v) AS BIGINT) AS dot
      |  FROM pp JOIN emb ea ON ea.t = pp.qt
      |  JOIN emb eb ON eb.t = pp.dtt AND eb.j = ea.j
      |  GROUP BY 1, 2, 3, 4, 5),
      |cosm AS (
      |  SELECT query_id, hit_id, qt, ctf,
      |    MAX(dot / sqrt(na.n2 * nb.n2)) AS mx
      |  FROM dots JOIN tn2 na ON na.t = dots.qt
      |  JOIN tn2 nb ON nb.t = dots.dtt
      |  WHERE na.n2 > 0 AND nb.n2 > 0
      |  GROUP BY 1, 2, 3, 4),
      |sc AS (
      |  SELECT query_id, hit_id, SUM(ctf * mx) AS maxsim
      |  FROM cosm GROUP BY 1, 2),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |    ORDER BY ROUND(maxsim, 4) DESC, hit_id) rn FROM sc)
      |SELECT query_id, rn AS rank, hit_id,
      |  FLOOR(maxsim * 10000 + 0.5) / 10000 AS maxsim_score
      |FROM r WHERE rn <= 3 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    val cand = bm25Ranked(s, dir).filter(col("rn") <= 10)
      .select(col("query_id"), col("doc_id").as("hit_id"))
      .cache() // consumed by needed, qterms, and dterms
    cand.count() // eager: the embedder subtree depends on cand
    val needed = cand.select(col("query_id").as("doc_id"))
      .unionByName(cand.select(col("hit_id").as("doc_id"))).distinct()
    val terms = Tables.documents(s, dir)
      .join(broadcast(needed), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("ctf"))
      .cache() // consumed by vocab, qterms, dterms
    terms.count()
    // vocab-level dense embeddings: 8 centered md5 nibbles — exact
    // small integers carried as doubles so the dot runs through the
    // codegen'd DotProduct (HOF zip_with/aggregate is CodegenFallback
    // and would break the whole-stage span); all sums stay exact
    val nib = (j: Int) =>
      (conv(substring(md5(col("t")), j, 1), 16, 10).cast("int") - lit(8))
    val emb = terms.select(col("t")).distinct()
      .select(col("t"),
        array((1 to 8).map(j => nib(j).cast("double")): _*).as("vec"),
        (1 to 8).map(j => nib(j) * nib(j)).reduce(_ + _)
          .cast("long").as("n2"))
    val dot = graft.functions.VectorExprs.dot(col("qv"), col("dv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("maxsim"), 4).desc, col("hit_id"))
    cand.join(terms.select(col("doc_id").as("query_id"),
        col("t").as("qt"), col("ctf")), "query_id")
      .join(terms.select(col("doc_id").as("hit_id"),
        col("t").as("dtt")), Seq("hit_id"))
      .join(broadcast(emb.select(col("t").as("qt"), col("vec").as("qv"),
        col("n2").as("na"))), "qt")
      .join(broadcast(emb.select(col("t").as("dtt"), col("vec").as("dv"),
        col("n2").as("nb"))), "dtt")
      .filter(col("na") > 0 && col("nb") > 0)
      .select(col("query_id"), col("hit_id"), col("qt"), col("ctf"),
        (dot.cast("double") /
          sqrt((col("na") * col("nb")).cast("double"))).as("cos"))
      .groupBy(col("query_id"), col("hit_id"), col("qt"), col("ctf"))
      .agg(max(col("cos")).as("mx"))
      .groupBy(col("query_id"), col("hit_id"))
      .agg(sum(col("ctf") * col("mx")).as("maxsim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("rn").as("rank"), col("hit_id"),
        (floor(col("maxsim") * 10000 + 0.5) / 10000).as("maxsim_score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Retrieval-quality evaluation — the IR eval harness every
    * retrieval pipeline ships next to the retrieval itself: standard
    * rank metrics per query over the shared BM25 ranking against a
    * DETERMINISTIC relevance table (relevant(q, d) ⟺ same `source` —
    * the topical proxy a synthetic corpus affords; a production eval
    * swaps in judged qrels, the metric dataflow is identical).
    * Precision@3, reciprocal rank@10, and nDCG@10, all as exact rank
    * arithmetic (the DCG terms are same-sign 1/log2 doubles under the
    * bm25 float-sum discipline; the ideal DCG is a fixed ascending
    * fold over min(R,10) terms with R = the query's corpus-wide
    * relevant count — a tiny source-size broadcast; R = 0 yields NULL
    * on BOTH engines, guarded explicitly because Spark's
    * sequence(1, 0) infers step −1 where DuckDB's range is empty)
    * rounded once at 4dp. Scale shape: the ranking is the existing bm25 join (bounded
    * query set broadcast), the relevance join attaches two source
    * lookups (query side broadcast), and the metrics are ONE
    * partial-aggregating groupBy — no second corpus pass, no window
    * beyond the ranking's own. */
  val eval: Q = Q(
    "retrieval_eval",
    s"""WITH $bm25Cte,
      |src AS (SELECT doc_id, source FROM documents),
      |ssz AS (SELECT source, COUNT(*) AS sn FROM src GROUP BY 1),
      |rel AS (
      |  SELECT r.query_id, r.rn, z.sn - 1 AS n_rel,
      |    CASE WHEN ds.source = qs.source THEN 1 ELSE 0 END AS is_rel
      |  FROM ranked r
      |  JOIN src ds ON r.doc_id = ds.doc_id
      |  JOIN src qs ON r.query_id = qs.doc_id
      |  JOIN ssz z ON qs.source = z.source)
      |SELECT query_id,
      |  ROUND(CAST(SUM(CASE WHEN rn <= 3 THEN is_rel ELSE 0 END)
      |    AS DOUBLE) / 3.0, 4) AS p_at_3,
      |  ROUND(COALESCE(CAST(1.0 AS DOUBLE) /
      |    MIN(CASE WHEN is_rel = 1 AND rn <= 10 THEN rn END), 0.0), 4)
      |    AS rr_at_10,
      |  CAST(COALESCE(MIN(CASE WHEN is_rel = 1 THEN rn END), 0) AS BIGINT)
      |    AS first_rel_rank,
      |  CASE WHEN MIN(n_rel) < 1 THEN NULL ELSE ROUND(
      |    SUM(CASE WHEN rn <= 10 THEN is_rel / log2(rn + 1.0)
      |      ELSE 0.0 END)
      |    / list_sum(list_transform(
      |        range(1, CAST(LEAST(MIN(n_rel), 10) AS INTEGER) + 1),
      |        i -> 1.0 / log2(i + 1.0))), 4) + 0 END AS ndcg_at_10
      |FROM rel GROUP BY query_id ORDER BY query_id""".stripMargin) {
    (s, dir) =>
      val src = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
      val ssz = src.groupBy(col("source")).agg(count(lit(1)).as("sn"))
      // only the doc_id<5 query set can match on query_id, so the
      // broadcast frame is 5 rows — broadcasting unfiltered src here
      // would ship the WHOLE corpus to every executor (the r15
      // scaling-side-broadcast class, caught by the PlanSpec sweep)
      val qsrc = src.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"),
          col("source").as("qsrc"))
      val idcg = expr("""aggregate(sequence(1,
        CAST(LEAST(MIN(n_rel), 10) AS INT)),
        0D, (a, i) -> a + 1.0 / log2(i + 1.0))""")
      bm25Ranked(s, dir)
        .join(src, "doc_id")
        .join(broadcast(qsrc.join(ssz,
          col("qsrc") === col("source")).drop("source")
          .withColumn("n_rel", col("sn") - 1).drop("sn")), "query_id")
        .withColumn("is_rel",
          (col("source") === col("qsrc")).cast("long"))
        .groupBy(col("query_id"))
        .agg(
          round(sum(when(col("rn") <= 3, col("is_rel")).otherwise(0L))
            .cast("double") / 3.0, 4).as("p_at_3"),
          round(coalesce(lit(1.0) /
            min(when(col("is_rel") === 1L && col("rn") <= 10, col("rn"))),
            lit(0.0)), 4).as("rr_at_10"),
          coalesce(min(when(col("is_rel") === 1L, col("rn"))), lit(0))
            .cast("long").as("first_rel_rank"),
          when(min(col("n_rel")) < 1, lit(null))
            .otherwise(round(sum(when(col("rn") <= 10,
              col("is_rel") / log2(col("rn") + 1.0)).otherwise(0.0))
            / idcg, 4) + 0).as("ndcg_at_10"))
        .orderBy(col("query_id"))
  }

  /** Pseudo-relevance feedback (Rocchio/RM shape) — the classic
    * recall lever a lexical retriever ships next to hybrid/RRF: run
    * BM25 once, assume the top-3 are relevant, harvest the 5
    * strongest expansion terms from them (Σ_fb tf·idf, ranked on the
    * printed 4dp grid with the term string as tiebreak — the
    * retrieval-family tie rule), union them into the query term set,
    * and score ONCE more with the identical BM25 machinery
    * (bm25RankedFor — pass 2 cannot drift from pass 1's semantics).
    * Expansion terms enter as plain query terms (uniform Rocchio β),
    * declared semantics in both engines. Scale shape: both passes are
    * the proven bm25 dataflow (query set broadcast, ONE corpus-wide
    * tf shuffle per pass); the feedback/expansion frames are
    * (queries×terms)-bounded and broadcast. */
  val prf: Q = Q(
    "retrieval_prf",
    s"""WITH $bm25Cte,
      |fb AS (SELECT query_id, doc_id FROM ranked WHERE rn <= 3),
      |w AS (
      |  SELECT fb.query_id, tf.t,
      |    SUM(tf.tf * ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1))
      |      AS w
      |  FROM fb JOIN tf ON fb.doc_id = tf.doc_id
      |  JOIN df ON tf.t = df.t
      |  CROSS JOIN stats
      |  GROUP BY 1, 2),
      |ex AS (
      |  SELECT query_id, t FROM (
      |    SELECT w.query_id, w.t, ROW_NUMBER() OVER (
      |      PARTITION BY w.query_id
      |      ORDER BY ROUND(w.w, 4) DESC, w.t) ern
      |    FROM w
      |    WHERE NOT EXISTS (SELECT 1 FROM qt
      |      WHERE qt.query_id = w.query_id AND qt.t = w.t)) r
      |  WHERE ern <= 5),
      |qt2 AS (
      |  SELECT query_id, t FROM qt
      |  UNION SELECT query_id, t FROM ex),
      |scored2 AS (
      |  SELECT qt2.query_id, tf.doc_id,
      |    SUM(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
      |      * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)))
      |      AS score
      |  FROM qt2 JOIN tf ON qt2.t = tf.t
      |  JOIN df ON tf.t = df.t
      |  JOIN dl ON tf.doc_id = dl.doc_id
      |  CROSS JOIN stats
      |  WHERE tf.doc_id <> qt2.query_id
      |  GROUP BY 1, 2),
      |ranked2 AS (
      |  SELECT query_id, doc_id, score, ROW_NUMBER() OVER (
      |    PARTITION BY query_id
      |    ORDER BY ROUND(score, 4) DESC, doc_id) rn
      |  FROM scored2)
      |SELECT query_id, rn AS rank, doc_id, ROUND(score, 4) AS score
      |FROM ranked2 WHERE rn <= 3
      |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    // ONE definition of each term-statistic frame, shared by both
    // scoring passes and the feedback-weight stage — identical
    // canonical subtrees, so the engine's exchange/stage reuse
    // dedupes their shuffles at runtime without a cache (the r16
    // measurement stands: materializing these frames serializes
    // their consumers and measured SLOWER at local[32] than the
    // fully parallel recompute; a same-session A/B this round
    // re-confirmed it — cached 5.6 s vs uncached 5.0 s).
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
    val tf = tok.groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dl = tok.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("double").as("dl"))
    val df = tok.groupBy(col("t"))
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    val stats = tok.agg(
      countDistinct(col("doc_id")).cast("double").as("n"),
      (count(lit(1)).cast("double") / countDistinct(col("doc_id"))).as("avgdl"))
    val qt1 = tok.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("t")).distinct()
    val fb = bm25RankedOver(qt1, tf, dl, df, stats).filter(col("rn") <= 3)
      .select(col("query_id"), col("doc_id"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1)
    // no broadcast hint on df (full vocabulary — sf-scaling); the
    // feedback-doc term set is bounded but only materializes inside
    // this very join, so AQE's runtime choice is the right form.
    // broadcast(stats) is the same subtree the scoring passes build
    // (reused exchange); the unused avgdl column costs nothing.
    val w = broadcast(fb).join(tf, "doc_id")
      .join(df, "t")
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("t"))
      .agg(sum(col("tf") * idf).as("w"))
    val ex = w.join(qt1, Seq("query_id", "t"), "left_anti")
      .withColumn("ern", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(round(col("w"), 4).desc, col("t"))))
      .filter(col("ern") <= 5)
      .select(col("query_id"), col("t"))
      // Eager localCheckpoint of the EXPANSION TERMS — the ≤ 5-terms
      // × queries frame, the minLabelClusters precedent. Without it
      // qt2 embeds the ENTIRE pass-1 ranking pipeline, and pass 2
      // broadcasts qt2 twice (scorer + df prune), so the final plan
      // carried pass 1 wholesale two more times (52 scans / 142
      // exchanges, +78% on the driver — VERDICT r16 #3). Pass 1 now
      // runs exactly once, inside this same timed invocation (the
      // checkpoint materializes during query construction — nothing
      // persists across runs), and the final plan is one clean BM25
      // pass over qt1 ∪ 25 checkpointed rows.
      .localCheckpoint()
    val qt2 = qt1.unionByName(ex)
    bm25RankedOver(qt2, tf, dl, df, stats)
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("rn").as("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    * Lafferty 2001) — the probabilistic LM twin of BM25, scored in
    * the standard rank-equivalent decomposition that never touches
    * unmatched terms:
    *
    *   log p(q|d) = Σ_{t∈q∩d} qtf·ln(1 + tf·|C|/(μ·ctf)) + |q|·ln(μ/(dl+μ))
    *
    * with μ=10 (sized to this corpus's short docs; the conventional
    * 2000 assumes web-page lengths), collection model p(t|C) =
    * ctf/|C|. Docs sharing no query term are not candidates
    * (join semantics — same contract as the BM25 family). Unlike
    * bm25's DISTINCT term set, qtf carries query-term MULTIPLICITY —
    * the LM weights repeated terms.
    *
    * Scale shape: identical to bm25RankedFor — broadcast query
    * terms, one corpus tf shuffle, vocab-level ctf broadcast,
    * doc-level dl join; ranking on the printed 4dp grid + doc_id
    * (the sf1 tied-replica lesson). The matched-term float sum is
    * same-sign (every summand positive), the bm25 family's accepted
    * rounding class. */
  val lmDirichlet: Q = Q(
    "retrieval_lm_dirichlet",
    s"""WITH $bm25Base,
      |ctf AS (SELECT t, COUNT(*)::DOUBLE ctf FROM tok GROUP BY 1),
      |tot AS (SELECT COUNT(*)::DOUBLE tot FROM tok),
      |qt AS (
      |  SELECT doc_id AS query_id, t, COUNT(*)::DOUBLE qtf
      |  FROM tok WHERE doc_id < 5 GROUP BY 1, 2),
      |ql AS (SELECT query_id, SUM(qtf) AS qlen FROM qt GROUP BY 1),
      |scored AS (
      |  SELECT qt.query_id, tf.doc_id,
      |    SUM(qt.qtf * ln(1 + tf.tf * tot.tot / (10 * ctf.ctf)))
      |      + MIN(ql.qlen) * ln(10 / (MIN(dl.dl) + 10)) AS score
      |  FROM qt JOIN tf ON qt.t = tf.t
      |  JOIN ctf ON qt.t = ctf.t
      |  JOIN dl ON tf.doc_id = dl.doc_id
      |  JOIN ql ON qt.query_id = ql.query_id
      |  CROSS JOIN tot
      |  WHERE tf.doc_id <> qt.query_id
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT query_id, doc_id, score, ROW_NUMBER() OVER (
      |    PARTITION BY query_id
      |    ORDER BY ROUND(score, 4) DESC, doc_id) rn
      |  FROM scored)
      |SELECT query_id, rn AS rank, doc_id,
      |  ROUND(score, 4) + 0 AS score
      |FROM ranked WHERE rn <= 5
      |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
    val tf = tok.groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dl = tok.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("double").as("dl"))
    val ctf = tok.groupBy(col("t"))
      .agg(count(lit(1)).cast("double").as("ctf"))
    val tot = tok.agg(count(lit(1)).cast("double").as("tot"))
    val qt = tok.filter(col("doc_id") < 5)
      .groupBy(col("doc_id").as("query_id"), col("t"))
      .agg(count(lit(1)).cast("double").as("qtf"))
    val ql = qt.groupBy(col("query_id")).agg(sum(col("qtf")).as("qlen"))
    // ctf pruned to the bounded query-term set before the broadcast
    // (the bm25RankedFor rule: full-vocabulary term stats are never a
    // forced build side)
    val ctfQ = ctf.join(broadcast(qt.select(col("t")).distinct()),
      Seq("t"), "left_semi")
    val scored = broadcast(qt).join(tf, "t")
      .join(broadcast(ctfQ), "t")
      .join(dl, "doc_id")
      .join(broadcast(ql), "query_id")
      .crossJoin(broadcast(tot))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg((sum(col("qtf") * log(lit(1.0)
          + col("tf") * col("tot") / (lit(10.0) * col("ctf"))))
        + min(col("qlen")) * log(lit(10.0) / (min(col("dl")) + 10.0)))
        .as("score"))
    scored.withColumn("rn", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(round(col("score"), 4).desc, col("doc_id"))))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("rn").as("rank"), col("doc_id"),
        (round(col("score"), 4) + 0).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  val all: Seq[Q] = Seq(bm25, context, summarize, conversationReplay,
    embedHashing, retrievalVector, docLoadFiles, qaPipeline, hybrid, rrf, mmr,
    maxsim, eval, prf, lmDirichlet)
}
