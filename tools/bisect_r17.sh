#!/bin/bash
# r17 bisect driver: driver-protocol timing (one JVM, 3 passes per
# query list — pass 1 is JIT/codegen warm-up, score = min(pass2, pass3))
# over the regressed families. Usage: tools/bisect_r17.sh <tag>
# Env: SPARK_GRAFT_PREFER_SMJ / SPARK_GRAFT_SHJ_LOCALMAP pass through.
set -u
TAG=$1
QUERIES="dedup_ngram_jaccard dedup_minhash_lsh dedup_clusters dedup_simhash corpus_split_safe corpus_triplets corpus_clean retrieval_prf retrieval_bm25 qa_pipeline text_jsd text_spell_correct token_shards vec_quantize_int8"
mkdir -p /tmp/bisect_r17
OUT=/tmp/bisect_r17/${TAG}.log
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} tools/run.sh graft.tools.TimeQuery \
  /root/testdata/sf0.1 $QUERIES $QUERIES $QUERIES 2>/dev/null \
  | grep '^\[time\]' > "$OUT"
echo "== $TAG (min of pass2/pass3) =="
awk '{t[$2] = t[$2] == "" ? $3 : t[$2] "," $3} END {for (q in t) print q, t[q]}' "$OUT" | sort
