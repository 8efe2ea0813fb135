#!/usr/bin/env python
"""Round-4 curation tiers, end to end on the sample corpus.

    python examples/curation_extras.py

1. ExactSubstr scrub: remove every cross-document verbatim repeat of
   >= 8 tokens at span granularity (Lee et al. 2022 semantics).
2. Diverse coreset: greedy k-center over the embeddings — the
   maximally-spread representative subset (selection, not removal).
3. Graph centrality: PageRank over the customer->supplier order-flow
   graph — the quality-weighting signal tier.
4. Tokenizer training: unigram-LM (SentencePiece-style) by distributed
   Viterbi-EM, next to the BPE trainer.

Every stage is the independently tested operator; the registered queries
(`dedup_exact_substr_spans`, `select_k_center_coreset`,
`graph_pagerank_trade`, `unigram_tokenize_corpus`) run the same
computations against their oracles.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.operators import coreset, dedup, graph, unigram_lm
from demo_otel_parquet_antalya_spark.plans.tables import load_table
from demo_otel_parquet_antalya_spark.session import get_spark

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="curation-extras")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF, "documents")

    print("== 1. ExactSubstr scrub (>= 8-token cross-doc repeats) ==")
    scrubbed = dedup.scrub_exact_substrings(docs, n=8)
    stats = scrubbed.agg(
        F.count("*").alias("docs"),
        F.sum("n_scrubbed_tokens").alias("tokens_removed"),
        F.sum(F.when(F.col("n_scrubbed_tokens") > 0, 1).otherwise(0)).alias("docs_touched"),
    ).first()
    print(f"   {stats.docs} docs, {stats.docs_touched} touched, {stats.tokens_removed} tokens removed")

    print("== 2. k-center coreset over embeddings ==")
    emb = load_table(spark, SF, "embeddings")
    for r in coreset.k_center_select(emb, k=5).collect():
        print(f"   round {r.sel_round}: vec {r.vec_id} (min-dist {r.mind:.4f})")

    print("== 3. PageRank over the order-flow graph ==")
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    edges = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    top = graph.pagerank(edges, k=6).orderBy(F.col("rank").desc()).limit(5).collect()
    for r in top:
        print(f"   {r.node}: {r.rank:.6f}")

    print("== 3b. HITS + triangle cliqueness on the same graphs ==")
    ha = graph.hits(edges, k=4).orderBy(F.col("authority").desc()).limit(3).collect()
    for r in ha:
        print(f"   {r.node}: hub {r.hub:.6f} authority {r.authority:.6f}")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.8)
    tri = graph.triangle_counts(pairs, src="id_a", dst="id_b")
    closed = tri.where(F.col("triangles") > 0).count()
    print(f"   near-dup graph: {tri.count()} nodes, {closed} inside a triangle")

    print("== 4. unigram-LM tokenizer (distributed Viterbi-EM) ==")
    vocab = unigram_lm.train_unigram_lm(docs, vocab_size=200, n_rounds=2, seed_size=500)
    head = vocab.orderBy(F.col("logprob").desc()).limit(8).collect()
    print("   top pieces:", [r.piece for r in head])
    enc = unigram_lm.apply_unigram(docs.limit(3), vocab)
    for r in enc.select("doc_id", F.slice("pieces", 1, 8).alias("p")).collect():
        print(f"   doc {r.doc_id}: {r.p} ...")


if __name__ == "__main__":
    main()
