"""ankiocr_spark — a PySpark-native main-content extraction engine.

A from-scratch rebuild of the capabilities of cfculhane/AnkiOCR
(reference at /root/reference, v0.7.1) recast per BASELINE.json:
instead of batch-OCR over Anki note images, this engine performs
batch main-content extraction over Common-Crawl-style web-page tables
(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).

Architecture (SURVEY.md §7): one pure-Python deterministic extraction
kernel (``kernel.py``) + thin declarative PySpark orchestration
(``job.py``). All per-document work is Arrow-batched via
``mapInPandas`` — no per-row Python UDFs anywhere in the hot path.
"""

__version__ = "0.1.0"

from .textclean import clean_text  # noqa: F401
from .kernel import extract_main_text, extract_spans, KERNEL_VERSION  # noqa: F401
