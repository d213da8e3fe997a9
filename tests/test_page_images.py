"""Page-image table (`operators/page_images.py`): PDF rows explode to
one JPEG row per page, non-PDF rows never reach Python (scan-side
predicate), garbage PDFs drop without failing the batch, and the JPEGs
decode back to the rasterizer's exact canvases."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from no_ocr_spark.extract.pdf import build_pdf
from no_ocr_spark.operators.page_images import page_images


def _pages_df(spark):
    rows = [
        {"url": "https://a.org/doc1",
         "html": build_pdf([["page one text"], ["page two"]]),
         "text": "x", "lang": "en"},
        {"url": "https://b.org/doc2",
         "html": b"<html><body>not a pdf</body></html>",
         "text": "y", "lang": "en"},
        {"url": "https://c.org/doc3",
         "html": build_pdf([["single page"]], style="aesv3"),
         "text": "z", "lang": "en"},
        {"url": "https://d.org/garbage",
         "html": b"%PDF-1.4 then complete garbage \xff\xff",
         "text": "w", "lang": "en"},
    ]
    ts = pd.to_datetime(["2024-01-01"] * len(rows), utc=True)
    pdf = pd.DataFrame(rows)
    pdf.insert(1, "warc_ts", ts)
    return spark.createDataFrame(
        pdf, "url string, warc_ts timestamp, html binary, text string, "
             "lang string")


def test_page_images_explode_and_decode(spark):
    from no_ocr_spark.extract.jpeg import jpeg_decode
    from no_ocr_spark.extract.raster import rasterize_pages

    out = page_images(_pages_df(spark), dpi=72).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r.url, []).append(r)
    # 2 pages + 1 page (AES-256 doc rasters too); garbage PDF yields no
    # usable pages (parse returns nothing text-bearing) or drops cleanly
    assert len(by_url["https://a.org/doc1"]) == 2
    assert len(by_url["https://c.org/doc3"]) == 1
    assert "https://b.org/doc2" not in by_url  # non-PDF filtered on scan
    r = sorted(by_url["https://a.org/doc1"], key=lambda r: r.page)[0]
    assert (r.page, r.width, r.height) == (1, 612, 792)
    # the JPEG decodes; its dark-pixel count matches the stored ink count
    img = jpeg_decode(bytes(r.jpeg))
    assert img.shape == (792, 612, 1)
    canvas = rasterize_pages(build_pdf([["page one text"], ["page two"]]),
                             dpi=72)[0]
    assert r.ink_pixels == int((canvas == 0).sum())
    dark = int((img[:, :, 0] < 128).sum())
    assert abs(dark - r.ink_pixels) <= max(8, r.ink_pixels // 2)
