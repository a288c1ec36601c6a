"""M1 — CoNLL-format reader (SURVEY.md §2.A M1).

Reference semantics (BASELINE.json:6 "its CoNLL-format evaluation
path"): one ``word<sep>tag`` per line, blank line = sentence
boundary, order preserved. Distributed design: files are the unit of
parallelism (like WARC files at CC scale) — ``wholetext`` read keeps
line order exact per file, then posexplode assigns line numbers, a
running sum over blank lines assigns sentence ids, and sort_array +
collect_list reassembles ordered word/tag arrays. No RDDs, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_conll(spark: SparkSession, path: str, sep: str = " ") -> DataFrame:
    """path (file/dir of CoNLL text) -> DF<doc_id, sent_id, words, tags>."""
    # NB: must be the reader *parameter* — .option("wholetext", ...)
    # is silently ignored by the text source in Spark 4
    files = (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("doc_id"),
            F.posexplode(F.split(F.col("value"), "\n")).alias("line_no", "line"),
        )
        .withColumn("line", F.rtrim(F.col("line")))
    )
    w = Window.partitionBy("doc_id").orderBy("line_no")
    numbered = files.withColumn(
        "sent_id",
        F.sum(F.when(F.col("line") == "", 1).otherwise(0)).over(w),
    ).filter(F.col("line") != "")
    parsed = numbered.select(
        "doc_id",
        "sent_id",
        "line_no",
        F.split(F.col("line"), sep).getItem(0).alias("word"),
        F.split(F.col("line"), sep).getItem(1).alias("tag"),
    )
    return (
        parsed.groupBy("doc_id", "sent_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("line_no", "word", "tag"))
            ).alias("rows")
        )
        .select(
            "doc_id",
            "sent_id",
            F.col("rows.word").alias("words"),
            F.col("rows.tag").alias("tags"),
        )
    )
