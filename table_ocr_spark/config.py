"""Extraction run configuration.

The analog of the reference's pydantic ``Payload`` (21 tunable knobs,
ttocr/api/models.py:31-67) and its SQLite-persisted ``TTOCRMLConfigs``
(ttocr/api/database.py:29-65).  A frozen dataclass: instances are broadcast
to executors and hashed into lineage rows (the reference logs every knob per
run for human-oracle verification, detectors.py:35-57).

Knob name mapping (reference → here):

* Hough ``threshold / min_line_length / max_line_gap`` (detectors.py:374-449)
  → separator-voting ``sep_threshold / sep_min_run / sep_max_gap``
* contour ``cell_threshold / min_columns`` (detectors.py:621-661)
  → ``cell_threshold / min_columns``
* contour ``min/max_solid_height_limit`` (detectors.py:593-619)
  → ``min_token_len / max_token_len``
* adaptive-threshold ``block_size / constant`` (preprocessors.py:313-400)
  → ``block_size / density_constant`` (local boilerplate decision)
* ``roi_offset`` (detectors.py:918-919, 979-1022) → ``roi_trim``
* dilate ``morph_size / iterations`` (preprocessors.py:515-579)
  → ``fuse_token_gap / fuse_line_gap`` (block fusion)
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class ExtractorConfig:
    name: str = "default"

    # --- mode selection (≈ DetectionMode, ttocr/detection/__init__.py:10-25) ---
    # auto: classify per payload; or force one of
    # explicit_markup | heuristic_layout | passthrough
    mode: str = "auto"

    # --- separator voting, explicit mode (≈ HoughLinesP, detectors.py:374-449) ---
    # a column offset becomes a separator when it is a boundary char in at
    # least sep_threshold fraction of table-candidate lines
    sep_threshold: float = 0.6
    # minimum consecutive table-candidate lines to accept a table region
    sep_min_run: int = 2
    # non-table lines tolerated inside one table region
    sep_max_gap: int = 0

    # --- separator dedupe (≈ _filter_overlapping_lines, detectors.py:258-298) ---
    sep_min_separation: int = 1

    # --- heuristic grid clustering (≈ ContourLinesDetector, detectors.py:593-711) ---
    # column_strategy "vote" = whitespace-column Hough voting (our default);
    # "bin" = the reference's integer binning `x // cell_threshold`
    # (detectors.py:646-651) — cell_threshold is live only in bin mode
    column_strategy: str = "vote"
    cell_threshold: int = 10
    min_columns: int = 2
    min_token_len: int = 1
    max_token_len: int = 200
    # minimum width (chars) of a whitespace run voted in as a column
    # separator in fixed-width layouts (single spaces stay inside cells)
    min_gap_width: int = 2

    # --- local boilerplate classification (≈ GaussianAdaptiveThresholder,
    #     preprocessors.py:313-400) ---
    block_size: int = 11
    density_constant: float = 0.05

    # --- block fusion (≈ Dilate, preprocessors.py:515-579) ---
    fuse_token_gap: int = 1
    fuse_line_gap: int = 1

    # --- cell trim (≈ roi_offset, detectors.py:979-1022) ---
    roi_trim: int = 0

    # --- repeated-line boilerplate for paged layouts (running headers/footers) ---
    page_header_min_pages: int = 2
    page_repeat_ratio: float = 0.6

    # --- global Otsu density threshold (≈ OtsuThresholder,
    #     preprocessors.py:403-481); off by default: the default pipeline
    #     (and committed golden) uses only the local/repeat classifiers ---
    use_otsu: bool = False

    # --- recognizer (≈ TesseractOCR knobs l/dpi/psm/oem, detectors.py:767-890:
    #     in the text domain recognition degenerates to cleanup; pluggable by
    #     name — functions/recognize.py registry) ---
    recognizer: str = "cleanup"

    # --- normalizer ---
    normalize_unicode: bool = True
    strip_zero_width: bool = True
    collapse_whitespace: bool = True

    # --- scale mechanics (ours; axis B) ---
    # conversations with more turns than this get salted (skew handling)
    skew_turns_threshold: int = 1000
    salt_buckets: int = 16
    target_partitions: int = 0  # 0 = leave to spark.sql.shuffle.partitions

    def config_hash(self) -> str:
        """Stable hash stamped into lineage rows (run identity)."""
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode("utf-8")).hexdigest()[:16]

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "ExtractorConfig":
        return cls(**json.loads(s))


DEFAULT_CONFIG = ExtractorConfig()

# An alternate config used by tests to prove config-sensitivity and that
# lineage stamps distinct config hashes (FIXTURES.md §3).  bin strategy
# makes cell_threshold live (reference binning, detectors.py:646-651).
ALT_CONFIG = ExtractorConfig(
    name="alt", min_columns=3, cell_threshold=4, column_strategy="bin"
)
