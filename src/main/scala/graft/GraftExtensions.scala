package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{AsciiTokens, DotProduct, GramianAgg, MinHashAgg, PolyWindowHashes, SimHashAgg, TopKAgg, UnicodeTokens}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession sets
  * it), then:
  *
  * {{{
  *   SELECT graft_dot(a.v, b.v)                 -- codegen'd dot product
  *   SELECT minhash_sketch(xxhash64(s), 128)    -- MinHash signature agg
  *   SELECT simhash64(xxhash64(t), cnt)         -- weighted SimHash agg
  *   SELECT topk_by(score, id, 10)              -- bounded top-k agg
  *   SELECT graft_tokens(text)                  -- one-pass tokenizer
  *   SELECT graft_tokens_unicode(text)          -- \p{L}\p{N} UTF-8 twin
  *   SELECT gramian(vec, 64)                    -- [n|Σx|ΣxxT] moment agg
  *   SELECT poly_window_hashes(hs, 16, 60)      -- rolling window hashes
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sketch"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_sketch"),
      (args: Seq[Expression]) =>
        MinHashAgg(args(0), litInt(args(1), "minhash_sketch"))
          .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash64"),
      (args: Seq[Expression]) =>
        SimHashAgg(args(0), args(1)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[AsciiTokens].getName, "graft_tokens"),
      (args: Seq[Expression]) => AsciiTokens(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_tokens_unicode"),
      new ExpressionInfo(classOf[UnicodeTokens].getName,
        "graft_tokens_unicode"),
      (args: Seq[Expression]) => UnicodeTokens(args(0))))
    ext.injectFunction((
      FunctionIdentifier("topk_by"),
      new ExpressionInfo(classOf[TopKAgg].getName, "topk_by"),
      (args: Seq[Expression]) =>
        TopKAgg(args(0), args(1), litInt(args(2), "topk_by"))
          .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("gramian"),
      new ExpressionInfo(classOf[GramianAgg].getName, "gramian"),
      (args: Seq[Expression]) =>
        GramianAgg(args(0), litInt(args(1), "gramian"))
          .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("poly_window_hashes"),
      new ExpressionInfo(classOf[PolyWindowHashes].getName,
        "poly_window_hashes"),
      (args: Seq[Expression]) =>
        PolyWindowHashes(args(0), litInt(args(1), "poly_window_hashes"),
          litInt(args(2), "poly_window_hashes"))))
    // size(graft_tokens(x)) → ascii_token_count(x): fused single-pass
    // token counting for every session query, SQL included
    ext.injectOptimizerRule(_ => graft.plans.TokenCountRewrite)
    // SQL UPDATE / MERGE INTO over lake-catalog tables: the resolved
    // UpdateTable/MergeIntoTable plans swap for snapshot-publish
    // commands at the post-hoc seam (GraftSqlCommands.scala)
    ext.injectPostHocResolutionRule(_ => graft.sources.GraftRowLevelSql)
    // lake maintenance SQL (OPTIMIZE / VACUUM / DESCRIBE
    // HISTORY|DETAIL) — a delegating parser in front of Spark's,
    // recognizing only the four shapes Spark's grammar lacks
    ext.injectParser((_, delegate) =>
      new graft.sources.GraftSqlParser(delegate))
    // change-data-feed TVF over lake-catalog tables (Delta's
    // table_changes shape, key-parametrized):
    //   SELECT * FROM table_changes('graftlake.t', 'k', 1, 3)
    ext.injectTableFunction((
      FunctionIdentifier("table_changes"),
      new ExpressionInfo(graft.sources.GraftTvf.getClass.getName,
        "table_changes"),
      (args: Seq[Expression]) => graft.sources.GraftTvf.tableChanges(args)))
  }
}
