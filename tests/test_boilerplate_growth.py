"""Growth stability of ext_dedup_lines' boilerplate threshold (r4
advice item 8): the cutoff is a fraction of the corpus, so a segment
whose RELATIVE document frequency is unchanged must keep its
classification when the corpus is replicated — exactly where an
absolute ``df >= 3`` cutoff flips every twice-seen segment to
boilerplate.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.registry import QUERIES

from .conftest import SF_SMOKE


def _write_docs(spark, rows, path):
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "documents.parquet"))


def test_boilerplate_classification_stable_under_replication(spark, tmp_path):
    """Replicate the sf-smoke documents corpus 2x (fresh doc_ids for
    the copies): every segment's df doubles and so does the corpus,
    so relative frequency is unchanged — each ORIGINAL doc must get
    the identical (n_segments, n_boilerplate, clean_text) row in both
    corpora. With the old absolute threshold this fails: df=2
    segments (unique-ish) jump to df=4 >= 3 and get stripped."""
    docs = (
        spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
        .select("doc_id", "text")
        .collect()
    )
    base = [(int(r.doc_id), r.text) for r in docs]
    shift = max(d for d, _ in base) + 1
    doubled = base + [(d + shift, t) for d, t in base]

    p1 = str(tmp_path / "corpus1x")
    p2 = str(tmp_path / "corpus2x")
    _write_docs(spark, base, p1)
    _write_docs(spark, doubled, p2)

    q = QUERIES["ext_dedup_lines"]
    r1 = {r.doc_id: (r.n_segments, r.n_boilerplate, r.clean_text)
          for r in q(spark, p1).collect()}
    r2 = {r.doc_id: (r.n_segments, r.n_boilerplate, r.clean_text)
          for r in q(spark, p2).filter(F.col("doc_id") < shift).collect()}
    assert r1 == r2
    # the threshold must actually bite somewhere, or the test is vacuous
    assert any(v[1] > 0 for v in r1.values())
