"""Unified per-document extraction entry point (pure function).

This is the function the Spark pipeline vectorizes over Arrow batches
(operators/extract_udf.py). Role analogue: the reference's per-PDF hot loop
`get_pdf_images` (`no-ocr-api/np_ocr/data.py:14-33`), generalized to the
web-page input shape (url, html:binary) with an HTML branch (the main-content
extractor) and a PDF branch (layout spans).

Contract: total over arbitrary bytes (never raises — errors become a
quarantine record, the Spark-side replacement for the reference's hard
`assert len(images) == len(page_texts)` at data.py:28), deterministic,
zero cross-document state.
"""

from __future__ import annotations

from typing import Any

from no_ocr_spark.extract.boilerplate import extract_main_text
from no_ocr_spark.extract.pdf import is_pdf, page_text, parse_pdf


def extract_document(payload: bytes) -> dict[str, Any]:
    """bytes -> {text, spans, n_blocks, method, error}.

    * HTML branch: main-content text via the boilerplate classifier; spans =
      one struct per *content block* with page=1, bbox nulled (x/y have no
      meaning for HTML), block = block ordinal, line = 0.
    * PDF branch: text = all pages' span text; spans = per-page structs with
      real bboxes; page is 1-based (reference convention, data.py:56).
    """
    if payload is None:
        return _error_record("null_payload")
    try:
        data = bytes(payload)
        if is_pdf(data):
            return _extract_pdf(data)
        fmt = _sniff_image(data)
        if fmt is not None:
            # real crawls serve image bytes on document URLs; that is a
            # typed SKIP (no text to extract), not a quarantine — the
            # multimodal operators consume these payloads, not this path
            return {
                "text": "", "spans": [], "n_blocks": 0,
                "method": f"binary_{fmt}_v1", "error": None,
            }
        return _extract_html(data)
    except Exception as exc:  # noqa: BLE001 — quarantine, never kill the task
        return _error_record(f"{type(exc).__name__}: {exc}")


def _sniff_image(data: bytes) -> str | None:
    from no_ocr_spark.extract.image import sniff_format

    return sniff_format(data)


def _extract_html(payload: bytes) -> dict[str, Any]:
    text, blocks = extract_main_text(payload)
    spans = []
    ordinal = 0
    for b in blocks:
        if b.is_content:
            spans.append({
                "page": 1,
                "text": b.text,
                "x0": None, "y0": None, "x1": None, "y1": None,
                "block": ordinal, "line": 0,
            })
            ordinal += 1
    return {
        "text": text,
        "spans": spans,
        "n_blocks": len(blocks),
        "method": "html_densitometric_v1",
        "error": None,
    }


def _extract_pdf(payload: bytes) -> dict[str, Any]:
    pages = parse_pdf(payload)
    spans = []
    texts = []
    for pno, page_spans in enumerate(pages, start=1):  # 1-based, data.py:56
        if not page_spans:
            continue
        texts.append(page_text(page_spans))
        for sp in page_spans:
            spans.append({
                "page": pno,
                "text": sp.text,
                "x0": sp.x0, "y0": sp.y0, "x1": sp.x1, "y1": sp.y1,
                "block": sp.block, "line": sp.line,
            })
    return {
        "text": "\n\n".join(texts),
        "spans": spans,
        "n_blocks": len(pages),
        "method": "pdf_minispan_v1",
        "error": None,
    }


def _error_record(msg: str) -> dict[str, Any]:
    return {"text": "", "spans": [], "n_blocks": 0,
            "method": "error", "error": msg}


def extract_text(payload: bytes) -> str:
    """Convenience: just the main text."""
    return extract_document(payload)["text"]
