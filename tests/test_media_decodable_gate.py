"""Corrupt-payload posture of the per-frame decode stages + the gate.

The r9 media probe: extract_media_metadata degrades corrupt payloads
to length-derived features by design, but the per-frame stages
(sample_frames, resize_thumbnails) deliberately have NO error branch
-- a degraded per-frame placeholder would be indistinguishable from
real pixels. Consequence, measured here: one corrupt object kills the
whole decode stage. The production composition is
probe_decodable -> filter_decodable -> decode stage, with the probe
publishing exactly what was dropped (scan_corrupt_files posture) and
the filter a broadcast anti-join so payloads never cross an exchange.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_upc_syllabus_spark.operators import multimodal as mm
from etl_upc_syllabus_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media_with_corruption(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(30)
    media = mm.as_media_table(docs, "doc_id", "text")
    # corrupt ONE image payload: keep the PNG magic so sniffing still
    # routes it to the PNG decoder, then truncate mid-stream -- the
    # shape a half-uploaded object really has
    images = media.filter(F.col("media_type") == "image")
    victim = images.select("doc_id").orderBy("doc_id").limit(1).collect()[0]["doc_id"]
    corrupted = media.withColumn(
        "payload",
        F.when(
            F.col("doc_id") == victim, F.substring(F.col("payload"), 1, 40)
        ).otherwise(F.col("payload")),
    )
    return corrupted, victim


def test_decode_stage_dies_on_one_corrupt_payload(spark, media_with_corruption):
    """Posture pin: resize has no error branch on purpose (see module
    docstring); a corrupt payload must fail the stage LOUDLY, never
    emit placeholder pixels."""
    corrupted, _ = media_with_corruption
    with pytest.raises(Exception):
        mm.resize_thumbnails(corrupted).collect()


def test_probe_names_exactly_the_bad_payload(spark, media_with_corruption):
    corrupted, victim = media_with_corruption
    report = mm.probe_decodable(corrupted).collect()
    bad = {r["doc_id"]: r["error"] for r in report if not r["decodable"]}
    assert set(bad) == {victim}
    assert bad[victim]  # the reason is published
    assert all(r["error"] is None for r in report if r["decodable"])


def test_filter_decodable_unblocks_the_stage(spark, media_with_corruption):
    corrupted, victim = media_with_corruption
    gated = mm.filter_decodable(corrupted)
    rows = mm.resize_thumbnails(gated).collect()
    assert rows  # the stage runs end-to-end again
    assert victim not in {r["doc_id"] for r in rows}
    # and the gate dropped ONLY the corrupt row
    assert gated.count() == corrupted.count() - 1


def test_gate_never_shuffles_payloads(spark, media_with_corruption):
    """The anti side (bad ids) broadcasts; payload bytes must not
    cross an Exchange in the gated plan."""
    import re

    corrupted, _ = media_with_corruption
    plan = (
        mm.filter_decodable(corrupted)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for ex in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "payload" not in ex, ex


def test_probe_reports_null_payload_instead_of_dying(spark):
    """Review fix: bytes(None) raises TypeError outside the decoder
    except-list -- a NULL payload must be REPORTED undecodable, not
    kill the gate that exists to stop one bad object killing stages."""
    rows = [(1, "image", bytearray(b"\x89PNG not really")), (2, "image", None)]
    media = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    report = {r["doc_id"]: r for r in mm.probe_decodable(media).collect()}
    assert not report[2]["decodable"]
    assert report[2]["error"] == "null payload"
    gated = mm.filter_decodable(media)
    assert {r["doc_id"] for r in gated.collect()} == set()  # both bad, none crash
