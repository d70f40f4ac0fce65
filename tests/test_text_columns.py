"""Column-form F1 parity with the Python kernel (VERDICT r2 item 3).

Both implementations must agree on all three delimiters the reference
handles: ASCII bullet, U+F0B7 private-use bullet (Symbol-font bullets in
PDF-extracted text), and the comma (comma variant only). Reference:
etl_pipeline.py:311-314, etl_infrastructure.py:146.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_upc_syllabus_spark.functions import text as T
from etl_upc_syllabus_spark.pipeline import parse as P

CASES = [
    "a, b •c  d",
    "onlypuabullets",
    "no delimiters at all",
    "trailing comma, ",
    "•,•",  # delimiters only -> empty list
]


@pytest.mark.parametrize("include_comma", [True, False])
def test_column_form_matches_python_kernel(spark, include_comma):
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    got = [
        r.parts
        for r in df.select(
            T.bullet_split("s", include_comma=include_comma).alias("parts")
        ).collect()
    ]
    want = [P.split_bullets(s, include_comma=include_comma) for s in CASES]
    assert got == want
