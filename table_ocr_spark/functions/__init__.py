"""Pure extraction kernels.

Every function here is a pure function of ``(payload, config)`` — no
instance state, no wall-clock, no randomness.  The reference mutates
detector state per call (detectors.py:144-147,437); that is forbidden here
because it breaks determinism under parallel re-execution (SURVEY.md §7,
"determinism under parallelism").

These kernels are executed in two harnesses:

1. the single-node oracle (``table_ocr_spark.oracle``) that produces golden
   fixtures, and
2. the Arrow-batch pandas UDF (``table_ocr_spark.operators.extract_job``)
   that runs distributed.
"""

from table_ocr_spark.functions.extract import ExtractResult, classify_mode, extract_payload

__all__ = ["ExtractResult", "classify_mode", "extract_payload"]
