"""S1 (SURVEY §2.1): directory glob scan of raw PDF files via the
binaryFile source — the Spark realization of the reference's
`folder_path.glob("*.pdf")` ingest (no-ocr-api/np_ocr/data.py:45-47) —
flowing straight into the same extraction operator."""

import os

from pyspark.sql import functions as F

from no_ocr_spark.extract.pdf import build_pdf
from no_ocr_spark.operators.extract_udf import extract


def test_binaryfile_glob_to_extraction(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pdf_dir"))
    for i in range(4):
        with open(os.path.join(d, f"doc{i}.pdf"), "wb") as f:
            f.write(build_pdf([[f"file {i} line {j}" for j in range(3)],
                               [f"file {i} page two"]]))
    with open(os.path.join(d, "ignore.txt"), "wb") as f:
        f.write(b"not a pdf")

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(d)
    )
    assert files.count() == 4  # .txt filtered at the source (P4)

    pages = files.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )
    out = extract(pages)
    rows = out.select("url", "n_blocks", "method").collect()
    assert all(r.method == "pdf_minispan_v1" for r in rows)
    assert all(r.n_blocks == 2 for r in rows)  # 2 pages each (S4 invariant)
