"""table_ocr_spark — a from-scratch PySpark-native main-content extraction engine.

Capabilities mirror the reference repo ``Nikronic/table-ocr`` (single-image
OpenCV + Tesseract table OCR, see ``/root/reference``) re-expressed in the
text/transcript domain over Spark DataFrames:

* input: a table of multi-turn conversation / agent transcripts
  ``(conv_id string, turn_idx int, role string, text string, tool string,
  ts timestamp)``
* output: per-turn ``clean_text`` (main content, boilerplate removed),
  ``cells array<array<string>>`` (row-major table grid — the analog of the
  reference's ``ocr_result: List[List[str]]``, ttocr/api/models.py:27-28),
  ``spans`` (char-offset cell spans — the hOCR word-bbox analog), and
  extraction metrics.

Design: all extraction semantics live in pure functions under
``table_ocr_spark.functions`` — the single-node oracle (``oracle.py``) and
the Spark pandas-UDF pipeline (``operators.extract_job``) both call the SAME
kernels, so per-turn text equality between Spark output and golden fixtures
holds by construction; only the Arrow transport layer can diverge, and it is
tested explicitly.
"""

from table_ocr_spark.config import ExtractorConfig, DEFAULT_CONFIG

__version__ = "0.1.0"

__all__ = ["ExtractorConfig", "DEFAULT_CONFIG", "__version__"]
