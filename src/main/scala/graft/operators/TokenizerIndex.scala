package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Persisted tokenizer model in the lake — the fit-once / serve-many
  * lifecycle the quality_nb model index established, applied to the
  * tokenizer family: a production pipeline fits its tokenizer ONCE
  * (an expensive, corpus-wide decision that must stay frozen for the
  * life of a training run — re-fitting per batch would silently
  * change every token count downstream) and every later consumer —
  * batch jobs, streaming ingest — loads the same frozen merge table.
  *
  * Layout: `idxDir/model` holds the WordPiece merge table
  * (step, left_sym, right_sym, merged, cnt — WordPieceFit.fit's
  * output verbatim), published atomically through
  * IndexLifecycle.buildOnce keyed to the fit's source+parameters, so
  * concurrent builders converge on one index and a stale key refits
  * exactly once. The apply vocabulary is reconstructed from the
  * merged column (bounded: alphabet + merges rows). */
object TokenizerIndex {

  /** Fit-and-publish once per `key` (the buildOnce contract: key =
    * source + parameters; same key → the existing index is kept). */
  def build(s: SparkSession, cappedWords: DataFrame, merges: Int,
      idxDir: String, key: String): Unit =
    IndexLifecycle.buildOnce(idxDir, key) { tmp =>
      WordPieceFit.fit(s, cappedWords, merges)
        .coalesce(1) // ≤ merges rows — one file keeps loads one read
        .write.parquet(s"$tmp/model")
    }

  /** The persisted model's greedy-apply vocabulary: fixed alphabet +
    * `</w>` + the frozen merge products. Bounded driver read. */
  def loadVocabulary(s: SparkSession, idxDir: String): Set[String] = {
    require(LakeFs.exists(s"$idxDir/model"),
      s"no tokenizer model published under $idxDir — run build first")
    WordPieceFit.vocabulary(
      s.read.parquet(s"$idxDir/model").select(col("merged"))
        .collect().map(_.getString(0)).toSeq)
  }
}
