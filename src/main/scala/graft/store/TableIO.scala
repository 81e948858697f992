package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Thin table-persistence facade.
  *
  * The north rule targets Iceberg tables; this sandbox ships no Iceberg
  * runtime jar (BASELINE.md), so the default implementation persists
  * through parquet under a warehouse directory. On a real cluster an
  * Iceberg-catalog implementation drops in behind the same trait
  * (`df.writeTo(name).append()` / `MERGE INTO`) with no caller changes.
  */
trait TableIO {
  def write(df: DataFrame, name: String, sortCols: Seq[String] = Nil): Unit
  def append(df: DataFrame, name: String): Unit
  def read(name: String): DataFrame
  def exists(name: String): Boolean
  def drop(name: String): Unit
  /** Replace a table that the new contents may also read from. */
  def replace(df: DataFrame, name: String): Unit
  /** Mark a multi-part (sharded) table committed. */
  def touchSuccess(name: String): Unit
  /** Append under a batch tag: fully written to a temp table first, then
    * moved in with tag-prefixed file names, so a crashed append is
    * detectable and removable by tag (see deleteTagged). */
  def appendTagged(df: DataFrame, name: String, tag: String): Unit
  /** Persist a tiny scalar marker (e.g. the format-version stamp) WITHOUT
    * launching a Spark job — markers are metadata, and paying a job per
    * build for a one-row table taxes the build's scaling ratio. */
  def writeMarker(name: String, value: String): Unit
  /** Read a marker written by writeMarker; None if absent. */
  def readMarker(name: String): Option[String]
  /** Remove files previously appendTagged with `tag` (crash cleanup);
    * returns how many data files were removed. */
  def deleteTagged(name: String, tag: String): Int
}

final class ParquetTableIO(spark: SparkSession, warehouse: String) extends TableIO {
  private def path(name: String) = s"$warehouse/$name"

  /** Writes are atomic-ish: parquet commit protocol moves task files into
    * place only on job success, so a killed build leaves no half-table
    * visible (the _SUCCESS marker gates `exists`). */
  override def write(df: DataFrame, name: String, sortCols: Seq[String]): Unit = {
    val out = if (sortCols.nonEmpty)
      df.sortWithinPartitions(sortCols.map(df.col): _*)
    else df
    out.write.mode(SaveMode.Overwrite).parquet(path(name))
  }

  override def append(df: DataFrame, name: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path(name))

  override def read(name: String): DataFrame = spark.read.parquet(path(name))

  override def touchSuccess(name: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path(name), "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).create(p, true).close()
  }

  override def exists(name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(name), "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  override def drop(name: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  private def fs =
    new org.apache.hadoop.fs.Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def appendTagged(df: DataFrame, name: String, tag: String): Unit = {
    val tmp = s"${name}__${tag}_tmp"
    df.write.mode(SaveMode.Overwrite).parquet(path(tmp))
    val dest = new org.apache.hadoop.fs.Path(path(name))
    fs.mkdirs(dest)
    fs.listStatus(new org.apache.hadoop.fs.Path(path(tmp)))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { f =>
        fs.rename(f.getPath, new org.apache.hadoop.fs.Path(dest, s"$tag-${f.getPath.getName}"))
      }
    drop(tmp)
  }

  override def deleteTagged(name: String, tag: String): Int = {
    drop(s"${name}__${tag}_tmp") // stale temp from a crashed write
    val p = new org.apache.hadoop.fs.Path(path(name))
    if (!fs.exists(p)) return 0
    val tagged = fs.listStatus(p).filter(_.getPath.getName.startsWith(s"$tag-"))
    tagged.foreach(f => fs.delete(f.getPath, false))
    tagged.length
  }

  override def writeMarker(name: String, value: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(path(name))
    val f = fs
    f.mkdirs(dir)
    val out = f.create(new org.apache.hadoop.fs.Path(dir, "MARKER"), true)
    out.write(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    touchSuccess(name)
  }

  override def readMarker(name: String): Option[String] = {
    val m = new org.apache.hadoop.fs.Path(path(name), "MARKER")
    val f = fs
    if (f.exists(m)) {
      val in = f.open(m)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    } else if (exists(name)) {
      // pre-round-4 warehouses persisted the marker as a one-row parquet
      // table — still readable (a cold read here is fine; only the write
      // path is on the measured build). An EMPTY legacy table (partial
      // write) reads as no marker rather than a NoSuchElementException.
      spark.read.parquet(path(name)).take(1).headOption.map(_.get(0).toString)
    } else None
  }

  /** Write to a temp name first, then swap. (With an Iceberg catalog this
    * is a plain transactional overwrite.) Readers created before the swap
    * pin their old file listing and must be re-created (e.g. re-open the
    * engine after IndexBuilder.compact). */
  override def replace(df: DataFrame, name: String): Unit = {
    val tmp = name + "__tmp"
    df.write.mode(SaveMode.Overwrite).parquet(path(tmp))
    val fs = new org.apache.hadoop.fs.Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    drop(name)
    fs.rename(new org.apache.hadoop.fs.Path(path(tmp)),
      new org.apache.hadoop.fs.Path(path(name)))
    // invalidate any session-cached listing of the replaced files
    spark.catalog.refreshByPath(path(name))
  }
}
