package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.3).
  *
  * The reference's tables come from CSV files loaded into dataframes
  * (/root/reference/sql_to_ibis/tests/conftest.py, the data dir CSVs); graft
  * exposes the same loading capability Spark-first: schema'd readers
  * (no sampling-based inference jobs on the 100 TB path), columnar
  * parquet as the primary format, CSV/JSON for interchange.
  */
object Sources {

  /** Parquet: the primary columnar format — predicate pushdown,
    * column pruning and row-group skipping all apply. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Raw text, one row per LINE, with source-file provenance — the
    * line-oriented shape raw corpus dumps arrive in (r5b). Splitting
    * is per-file-block and parallel; no inference pass. */
  def textLines(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.{functions => F}
    spark.read.text(path)
      .select(F.input_file_name().as("source_file"),
        F.col("value").as("text"))
  }

  /** Raw text, one row per whole FILE — document-per-file corpora
    * (r5b). Each file must fit an executor partition; for big files
    * use [[textLines]] + reassembly or a record-delimited format. */
  def wholeTextFiles(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.{functions => F}
    spark.read.option("wholetext", "true").text(path)
      .select(F.input_file_name().as("source_file"),
        F.col("value").as("text"))
  }

  /** CSV with an explicit schema. Passing the schema avoids Spark's
    * inference pass (a full extra scan at scale). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** CSV with header-based inference — convenience for small/dim
    * tables only; the inference scan is O(input). */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** JSON-lines with an explicit schema (same inference rationale). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC: the other columnar interchange format — same pushdown/
    * pruning properties as parquet (footer stats + stripe skipping). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned parquet layout: downstream scans with a
    * predicate on the partition columns prune whole directories —
    * the primary data-layout lever at 100 TB. */
  def writeParquetPartitioned(df: DataFrame, path: String,
                              partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString).csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Bucketed managed table: co-locates rows by hash of the bucket
    * column, so equi-joins and aggregations between tables bucketed
    * the same way need NO shuffle — the storage-layout lever for
    * repeatedly-joined 100 TB fact tables. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** Round-trips a dataframe through a format on disk and reads it
    * back with the original schema — the parity check used by
    * SourcesSpec and the q_csv_roundtrip oracle entry. */
  def roundTrip(df: DataFrame, format: String, path: String): DataFrame = {
    val spark = df.sparkSession
    format match {
      case "parquet" => writeParquet(df, path); parquet(spark, path)
      case "orc"     => writeOrc(df, path); orc(spark, path)
      case "csv"     => writeCsv(df, path); csv(spark, path, df.schema)
      case "json"    => writeJsonLines(df, path); jsonLines(spark, path, df.schema)
      case other     => throw new IllegalArgumentException(s"unknown format $other")
    }
  }
}
