"""Shared fixture builders for the layout/gate measurement tools, so
cross-tool BASELINE comparisons provably measure the same shapes
(review r11: fusion_bench and clustering_probe each had their own copy
of the wide-payload synthesizer)."""

from __future__ import annotations


def wide_payload_col(id_col: str = "event_id", n_hashes: int = 32):
    """~1 KB opaque string per row: ``n_hashes`` md5 hexes of the id --
    deterministic, incompressible-ish, identical across tools."""
    from pyspark.sql import functions as F

    return F.concat_ws(
        "",
        *[F.md5(F.concat(F.col(id_col).cast("string"), F.lit(i)))
          for i in range(n_hashes)],
    )
