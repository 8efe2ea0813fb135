"""Incremental (new-batch-vs-index) MinHash dedup must find exactly the
cross pairs the batch pipeline finds — the index changes the COST model
(batch-proportional work), never the result."""

import pytest
from pyspark.sql import functions as F

from demo_otel_parquet_antalya_spark.operators import dedup
from demo_otel_parquet_antalya_spark.plans.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_docs(spark):
    docs = load_table(spark, SF, "documents").cache()
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return docs, new, corpus


def test_incremental_equals_batch_cross_pairs(spark, split_docs, tmp_path):
    docs, new, corpus = split_docs
    idx = str(tmp_path / "lsh_index")
    dedup.minhash_index_write(corpus, idx)

    inc = {
        (r.id_new, r.id_old, r.jaccard)
        for r in dedup.minhash_dedup_incremental(new, corpus, idx, threshold=0.9).collect()
    }

    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    batch_cross = {
        (r.id_a, r.id_b, r.jaccard) if r.id_a in new_ids else (r.id_b, r.id_a, r.jaccard)
        for r in dedup.minhash_dedup_pairs(docs, threshold=0.9).collect()
        if (r.id_a in new_ids) != (r.id_b in new_ids)  # exactly one side new
    }
    assert inc == batch_cross
    assert inc, "split produced no cross near-dup pairs — test data assumption broke"
    # sides are what they claim to be
    for id_new, id_old, _ in inc:
        assert id_new in new_ids and id_old not in new_ids


def test_index_partitioned_by_band(spark, split_docs, tmp_path):
    """Band partitioning is the pruning contract: a probe joining on band
    reads only colliding partitions, and maintenance appends are
    partition-local."""
    import os

    _, _, corpus = split_docs
    idx = str(tmp_path / "lsh_index")
    dedup.minhash_index_write(corpus, idx)
    bands = [d for d in os.listdir(idx) if d.startswith("band=")]
    assert len(bands) == 16
