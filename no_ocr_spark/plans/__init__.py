"""Driver-side plan logic: explicit partitioning + skew salting, and the
per-partition lineage / checkpoint-resume machinery (SURVEY.md §4 items 1-2).
"""

from no_ocr_spark.plans.partitioning import with_bucket, salted_host_counts  # noqa: F401
from no_ocr_spark.plans.lineage import run_with_lineage, pending_buckets  # noqa: F401
