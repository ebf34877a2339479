"""Streaming quality scoring: the trained perceptron's scoring
projection (operators/classifier.py) is stateless map-side work, so it
must run unchanged on a Structured Streaming source and reproduce the
batch scores exactly — the shape of a production filter that scores
documents as they are ingested, with weights trained offline."""

from __future__ import annotations

import shutil
import tempfile

from ecommerce_lakehouse_platform_spark.operators import classifier
from ecommerce_lakehouse_platform_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


def test_streaming_scores_match_batch(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    feats = classifier.quality_features(docs)
    # offline-trained weights (1 epoch keeps the test fast; scoring
    # parity is the property under test, not model quality)
    w = classifier.perceptron_fit(feats, dim=4, n_iters=1)

    src_dir = tempfile.mkdtemp(prefix="stream_docs_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_docs_ckpt_")
    try:
        docs.write.mode("overwrite").parquet(src_dir)
        schema = spark.read.parquet(src_dir).schema
        stream = spark.readStream.schema(schema).parquet(src_dir)
        assert stream.isStreaming
        scored = classifier.perceptron_score(
            classifier.quality_features(stream), w
        )
        assert scored.isStreaming  # the projection stayed streamable
        q = (
            scored.writeStream.format("memory")
            .queryName("quality_out")
            .outputMode("append")  # stateless: append, no state store
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.doc_id, r.y, r.score, r.pred)
            for r in spark.table("quality_out").collect()
        }
        want = {
            (r.doc_id, r.y, r.score, r.pred)
            for r in classifier.perceptron_score(feats, w).collect()
        }
        assert got == want and len(got) == docs.count()
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
