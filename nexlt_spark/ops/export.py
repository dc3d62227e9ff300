"""Export sinks — the reference's corpus-export formats, Spark-native.

The reference exports two shapes besides Solr posts:

- a delimiter-joined parallel corpus for Moses MT training: fields joined
  with a high-codepoint delimiter, one record per line, bzip2-compressed
  (parseJSON.pl:117-124,323-324; AthenaExportMt.java:294-302,552-553);
- tab-separated CSV with a fixed header (parseJSON.pl:126-137; goldens
  tools/test/deu-passolo-data.csv).

Spark transposition: assemble the line as one Column (concat_ws — JVM
side), write with `text`/`csv` writers; compression is the writer codec
(gzip/bzip2 per file — Parquet+zstd is the real engine storage, these
are interchange exports). Partitioned output = one file per task, the
distributed form of the reference's single growing file.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MOSES_DELIM = "◊"  # ◊ — the reference's field delimiter


def moses_lines(df: DataFrame, cols: List[str], delim: str = MOSES_DELIM) -> DataFrame:
    """(value) single-column DataFrame of delimiter-joined records.

    Nulls become empty fields (coalesce) — the Perl join semantics.
    """
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    return df.select(F.concat_ws(delim, *parts).alias("value"))


def export_moses(
    df: DataFrame,
    path: str,
    cols: List[str],
    delim: str = MOSES_DELIM,
    compression: Optional[str] = "bzip2",
    sort_col: Optional[str] = "doc_id",
) -> None:
    """Write the delimited corpus; deterministic line order per file when
    sort_col given (sortWithinPartitions — no global sort needed for an
    export that is consumed as a bag of lines)."""
    d = df
    if sort_col and sort_col in df.columns:
        d = d.sortWithinPartitions(sort_col)
    out = moses_lines(d, cols, delim)
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(path)


def export_tsv(
    df: DataFrame,
    path: str,
    cols: Optional[List[str]] = None,
    compression: Optional[str] = None,
) -> None:
    """Tab-separated export with header — the legacy CSV sink (S6).

    Newlines inside fields are scrubbed first (the reference guarantees
    this upstream, AthenaExportMt.java:456-458)."""
    d = df.select(*(cols or df.columns))
    for c, t in d.dtypes:
        if t == "string":
            d = d.withColumn(c, F.regexp_replace(F.col(c), r"[\n\r\t]", " "))
    w = d.write.mode("overwrite").option("sep", "\t").option("header", True)
    if compression:
        w = w.option("compression", compression)
    w.csv(path)
