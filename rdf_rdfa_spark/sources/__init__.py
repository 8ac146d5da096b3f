"""Input connectors for the KG-construction pipeline (north_star:
Common-Crawl-style web pages). Each reader lands on the canonical
pages schema (url, warc_ts, html, text, lang) — the BASELINE.json
input_hint shape — so everything downstream is source-agnostic."""

from .warc import read_warc_pages  # noqa: F401
from .jsonl import read_jsonl_pages  # noqa: F401
