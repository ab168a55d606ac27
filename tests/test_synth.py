"""Synthesizer contracts: JVM expression generator ≡ numpy reference;
fused generator ≡ separate generators; span-hash determinism."""

import numpy as np

from pyramids_spark import synth


def test_jvm_spans_match_numpy_reference(spark):
    got = synth.documents_spans(spark, 200).toPandas().sort_values("doc_id").reset_index(drop=True)
    exp = synth._spans_batch(np.arange(200)).sort_values("doc_id").reset_index(drop=True)
    assert list(got.doc_id) == list(exp.doc_id)
    for i in range(200):
        g = [(s["kind"], s["text"], s["media_ref"], int(s["offset"])) for s in got.spans[i]]
        e = [(s["kind"], s["text"], s["media_ref"], int(s["offset"])) for s in exp.spans[i]]
        assert g == e


def test_jvm_spans_match_numpy_at_huge_ids(spark):
    """ids >= 10^10 (beyond the old lpad-10 truncation point): doc_id must
    stay unique + byte-identical between the JVM and numpy generators, and
    key recovery via substring(doc_id, 5) must round-trip (ADVICE r1)."""
    start = 10**10 + 7
    got = synth.documents_spans(spark, 50, start=start).toPandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)
    exp = synth._spans_batch(np.arange(start, start + 50)).sort_values(
        "doc_id"
    ).reset_index(drop=True)
    assert list(got.doc_id) == list(exp.doc_id)
    assert len(set(got.doc_id)) == 50
    assert [int(d[4:]) for d in got.doc_id] == list(range(start, start + 50))
    for i in range(50):
        g = [(s["kind"], s["text"], s["media_ref"], int(s["offset"])) for s in got.spans[i]]
        e = [(s["kind"], s["text"], s["media_ref"], int(s["offset"])) for s in exp.spans[i]]
        assert g == e


def test_documents_full_matches_doc_points(spark):
    full = synth.documents_full(spark, 500).select("key", "x", "y").toPandas().sort_values("key")
    pts = synth.doc_points(spark, 500).select("key", "x", "y").toPandas().sort_values("key")
    np.testing.assert_array_equal(full.key.to_numpy(), pts.key.to_numpy())
    np.testing.assert_array_equal(full.x.to_numpy(), pts.x.to_numpy())  # bit-exact
    np.testing.assert_array_equal(full.y.to_numpy(), pts.y.to_numpy())


def test_span_hash_deterministic_across_runs(spark):
    a = synth.documents_full(spark, 100).select("doc_id", "span_hash").toPandas()
    b = synth.documents_full(spark, 100).select("doc_id", "span_hash").toPandas()
    m = a.merge(b, on="doc_id")
    assert (m.span_hash_x == m.span_hash_y).all()


def test_span_hash_sensitive_to_order_and_content(spark):
    from pyspark.sql import functions as F

    d = synth.documents_spans(spark, 50).withColumn("h0", synth.span_hash_col())
    rev = d.withColumn("spans", F.reverse("spans")).withColumn("h1", synth.span_hash_col())
    multi = rev.where(F.size("spans") > 1)
    changed = multi.where(F.col("h0") != F.col("h1")).count()
    assert changed == multi.count()  # any reorder flips the hash
