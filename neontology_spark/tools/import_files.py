"""File ingestion — S5 (reference ``tools/import_files.py:29-152``).

* JSON: native ``spark.read.json`` (schema from the catalog when known).
* YAML: no native Spark reader — whole-file text + an Arrow-batched
  parse kernel (mapInPandas) yielding records; the reference's
  one-Python-dict-per-file becomes one row per document per file.
* Markdown: YAML frontmatter (between ``---`` fences) parsed the same
  way, with the body attached as a ``body`` column
  (reference ``import_files.py:105-152``).

Batching (``batch_size``, reference ``:23-26``) is subsumed by Spark's
file partitioning: ``wholetext`` files are already one task per file
group; downstream merges are set-oriented regardless of batch size.

Scale note: YAML parsing is Python (pyyaml) inside mapInPandas — the slow
path, but inherently so (no JVM YAML in Spark); files ship as Arrow
string batches, parse is per-file not per-row, and the output feeds the
same set-oriented import_records pipeline.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def import_json_files(spark: SparkSession, path_glob: str, multiline: bool = True) -> DataFrame:
    """JSON records; ``multiLine`` for one-object/array-per-file layout
    (the reference's json.load semantics)."""
    return spark.read.option("multiLine", multiline).json(path_glob)


def _yaml_docs(text: str) -> list[dict]:
    import yaml

    return [d for d in yaml.safe_load_all(text) if isinstance(d, dict)]


def _split_frontmatter(text: str) -> tuple[Optional[dict], str]:
    """(frontmatter dict | None, body) — reference import_files.py:135-143."""
    if text.startswith("---"):
        parts = text.split("---", 2)
        if len(parts) >= 3:
            docs = _yaml_docs(parts[1])
            return (docs[0] if docs else None), parts[2].lstrip("\n")
    return None, text


def _records_df(spark: SparkSession, path_glob: str, parse_kind: str) -> DataFrame:
    files = spark.read.text(path_glob, wholetext=True)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for text in pdf["value"]:
                if parse_kind == "yaml":
                    for doc in _yaml_docs(text):
                        out.append(json.dumps(doc))
                else:  # markdown with frontmatter
                    fm, body = _split_frontmatter(text)
                    if fm is not None:
                        fm = dict(fm)
                        fm["body"] = body
                        out.append(json.dumps(fm))
            yield pd.DataFrame({"json": out})

    json_rows = files.mapInPandas(kernel, schema="json string")
    # one JVM-side pass infers the record schema from the JSON strings —
    # same semantics as spark.read.json on a text dataset
    return spark.read.json(json_rows.rdd.map(lambda r: r["json"]))


def import_yaml_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """YAML files (multi-document supported) → records DataFrame."""
    return _records_df(spark, path_glob, "yaml")


def import_md_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Markdown files with YAML frontmatter → records (+ ``body``)."""
    return _records_df(spark, path_glob, "md")
