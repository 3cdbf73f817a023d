"""External-source readers with the reference's robustness semantics.

The reference ingests messy public CSV/JSON corpora; this module recasts its
hand-rolled repair logic as Spark reader options (executor-side, scales with
input size — the pandas versions are single-process):

- S1 robust CSV (``codes/utils/generalFunctions.py:157-186``): header, '|'
  fallback delimiter, over-wide row repair → PERMISSIVE mode + corrupt-record
  capture
- S2 lossy CSV (``codes/search/construct_index.py:499-502``): latin-1,
  skip bad lines → ISO-8859-1 + DROPMALFORMED
- S3 JSON relation tables (``generalFunctions.py:146-155``): column-major
  ``{"relation": [[col, v1, v2...], ...]}`` → transposed DataFrame
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NULL_STRINGS = ["nan", "-", "unknown", "other (unknown)", "null", "na",
                "", " "]  # generalFunctions.py:59-64


def read_csv_robust(spark: SparkSession, path: str,
                    delimiter: str = ",") -> DataFrame:
    """PERMISSIVE parse with corrupt-record capture; if >50% of rows are
    corrupt, retry with the reference's fallback '|' delimiter
    (generalFunctions.py:166-170 tries the same ladder)."""
    def attempt(delim: str) -> DataFrame:
        return (spark.read
                .option("header", True)
                .option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", "_corrupt")
                .option("delimiter", delim)
                .option("multiLine", False)
                .csv(path))

    df = attempt(delimiter)
    data_cols = [c for c in df.columns if c != "_corrupt"]
    # a wrong delimiter shows up as ONE wide column whose header still
    # contains the real separator (Spark calls that a valid parse)
    if (delimiter != "|" and len(data_cols) == 1
            and "|" in data_cols[0]):
        return read_csv_robust(spark, path, delimiter="|")
    if "_corrupt" in df.columns:
        df_c = df.cache()
        total = df_c.count()
        bad = df_c.filter(F.col("_corrupt").isNotNull()).count()
        df_c.unpersist()
        if total and bad / total > 0.5 and delimiter != "|":
            return read_csv_robust(spark, path, delimiter="|")
    return df


def read_csv_lossy(spark: SparkSession, path: str) -> DataFrame:
    """latin-1 + drop malformed rows (construct_index.py:499-502)."""
    return (spark.read
            .option("header", True)
            .option("encoding", "ISO-8859-1")
            .option("mode", "DROPMALFORMED")
            .csv(path))


def normalize_nulls(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Fold the reference's null-string list into real NULLs (P3)."""
    for c in (columns or df.columns):
        if dict(df.dtypes).get(c) == "string":
            df = df.withColumn(
                c, F.when(F.lower(F.trim(F.col(c))).isin(NULL_STRINGS),
                          F.lit(None)).otherwise(F.col(c)))
    return df


def read_json_relation(spark: SparkSession, path: str) -> DataFrame:
    """Column-major JSON relation → row-major DataFrame.

    Reference shape (generalFunctions.py:146-155): ``{"relation": [[colname,
    v1, v2, ...], ...]}``. Recast: read as json, explode positions, pivot
    column names — stays distributed for a directory of such files (one row
    per file in the raw read)."""
    raw = spark.read.option("multiLine", True).json(path)
    if "relation" not in raw.columns:
        raise ValueError(f"{path} lacks a 'relation' field")
    cols = (raw
            .select(F.input_file_name().alias("tbl"),
                    F.explode("relation").alias("col"))
            .select("tbl",
                    F.col("col")[0].alias("name"),
                    F.expr("slice(col, 2, size(col) - 1)").alias("vals")))
    long = cols.select(
        "tbl", "name",
        F.posexplode("vals").alias("row_id", "val"))
    names = [r["name"] for r in
             cols.select("name").distinct().orderBy("name").collect()]
    return (long.groupBy("tbl", "row_id").pivot("name", names)
            .agg(F.first("val"))
            .orderBy("tbl", "row_id")
            .drop("tbl", "row_id"))
