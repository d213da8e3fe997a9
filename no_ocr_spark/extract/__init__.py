"""Pure-Python extraction core (no Spark imports allowed here).

The reference's extraction hot loop is `no-ocr-api/np_ocr/data.py:14-33`
(pypdf text per page + poppler raster per page, once per row). This package
re-derives the *capability* — document bytes -> (main text, per-page spans) —
as pure, deterministic, per-document functions so they can run inside
Arrow-batched pandas UDFs with zero cross-row state (byte-identical output
regardless of partitioning / batch boundaries).
"""

from no_ocr_spark.extract.api import extract_document, extract_text  # noqa: F401
