package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Crash-safe replace-a-state-directory primitive shared by the batch and
  * continuous entry points (reference semantics: the HBase profile tables
  * are replaced wholesale per run — `HogzillaBatch`/`HogAuth` overwrite
  * learned state each cycle).
  *
  * Uses the Hadoop FileSystem API throughout, so state can live on
  * HDFS/S3A as well as local disk (the `spark-submit` production story),
  * and — unlike a bare `java.io.File.renameTo` chain — every rename
  * checks its return value and fails loudly, and a marker file makes a
  * crash between the two renames recoverable instead of a silent
  * cold-start.
  *
  * Protocol (all paths derived from `target`):
  *  1. write the new state to `<target>.staging`
  *  2. create `<target>.swap` marker      (swap is now in flight)
  *  3. rename `<target>` → `<target>.old` (if a current state exists)
  *  4. rename `<target>.staging` → `<target>`
  *  5. delete `<target>.old`, delete marker
  *
  * [[recover]] completes a swap that died at any point after step 2: the
  * marker says staging is complete, so the staged state simply finishes
  * its promotion. A staging dir with NO marker is an incomplete write and
  * is discarded. Readers call [[readOrElse]], which recovers first.
  */
object StateSwap {

  private def fsFor(p: Path, conf: Configuration): FileSystem = p.getFileSystem(conf)

  private def stagingOf(t: Path) = new Path(t.getParent, t.getName + ".staging")
  private def oldOf(t: Path)     = new Path(t.getParent, t.getName + ".old")
  private def markerOf(t: Path)  = new Path(t.getParent, t.getName + ".swap")

  private def renameOrDie(fs: FileSystem, src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      sys.error(s"StateSwap: rename $src -> $dst failed (state left recoverable; " +
        "rerun recover/readOrElse)")

  /** Replace `target` with `df` via stage-then-swap. Loud on any failed
    * rename; a crash at any point leaves the state recoverable by
    * [[recover]] (old or new is always observable, never partial).
    */
  def swap(df: DataFrame, target: String): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val t = new Path(target)
    val fs = fsFor(t, conf)
    recover(df.sparkSession, target) // finish any prior in-flight swap first
    val staging = stagingOf(t)
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    fs.create(markerOf(t), true).close()
    if (fs.exists(t)) renameOrDie(fs, t, oldOf(t))
    renameOrDie(fs, staging, t)
    fs.delete(oldOf(t), true)
    fs.delete(markerOf(t), false)
  }

  /** Complete a swap that died mid-flight; discard incomplete staging
    * writes. No-op when the state is clean. Safe to call unconditionally
    * before any read.
    */
  def recover(spark: SparkSession, target: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val t = new Path(target)
    val fs = fsFor(t, conf)
    val (staging, old, marker) = (stagingOf(t), oldOf(t), markerOf(t))
    if (fs.exists(marker)) {
      // marker ⇒ staging finished writing; promote it if that didn't happen
      if (fs.exists(staging)) {
        if (fs.exists(t)) renameOrDie(fs, t, old)
        renameOrDie(fs, staging, t)
      }
      fs.delete(old, true)
      fs.delete(marker, false)
    } else {
      // no marker: any staging dir is an incomplete write; any .old dir is
      // post-promotion debris — both are safe to drop
      if (fs.exists(staging)) fs.delete(staging, true)
      if (fs.exists(old)) fs.delete(old, true)
    }
  }

  /** Atomically replace a GROUP of state tables in one swap: each
    * `(name, df)` is staged as `<root>.staging/<name>`, then the whole
    * root directory promotes with the same marker protocol as [[swap]].
    * Either every table advances or none does — the primitive a
    * multi-table per-batch commit needs (a marker row carried inside one
    * of the tables is then provably in sync with ALL of them; three
    * independent [[swap]]s would leave a crash window where the marker
    * says "applied" but a later table's merge was lost).
    *
    * The staged writes may read the CURRENT tables under `root` (the
    * usual state-merge shape): the root is not touched until every
    * staging write has finished.
    */
  def swapAll(root: String, tables: Seq[(String, DataFrame)]): Unit = {
    require(tables.nonEmpty, "swapAll needs at least one table")
    swapStaged(tables.head._2.sparkSession, root) { staging =>
      tables.foreach { case (name, df) =>
        df.write.mode(SaveMode.Overwrite).parquet(new Path(staging, name).toString)
      }
    }
  }

  /** Generalized staged swap: the caller populates the staging directory
    * however it likes (Spark writes, raw file copies, a mix), then the
    * whole root promotes under the same marker protocol as [[swapAll]].
    * This is the primitive for maintenance jobs that REWRITE part of a
    * state root and CARRY OVER the rest byte-for-byte (e.g.
    * [[SimilaritySearch.rebalanceIvfIndex]] copying unchanged IVF cell
    * directories instead of re-encoding them): the staged content may
    * read or copy from the CURRENT root, which is untouched until
    * `stage` returns.
    */
  def swapStaged(spark: SparkSession, root: String)(stage: String => Unit): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val t = new Path(root)
    val fs = fsFor(t, conf)
    recover(spark, root) // finish any prior in-flight swap first
    val staging = stagingOf(t)
    fs.delete(staging, true) // drop any marker-less (incomplete) staging debris
    stage(staging.toString)
    fs.create(markerOf(t), true).close()
    if (fs.exists(t)) renameOrDie(fs, t, oldOf(t))
    renameOrDie(fs, staging, t)
    fs.delete(oldOf(t), true)
    fs.delete(markerOf(t), false)
  }

  /** Recover-then-read for one table of a [[swapAll]] group: recovery
    * happens at ROOT level (the atomic unit), then the named table is
    * read if the group exists.
    */
  def readTableOrElse(spark: SparkSession, root: String, name: String,
                      default: => DataFrame): DataFrame = {
    recover(spark, root)
    val p = new Path(root, name)
    if (fsFor(p, spark.sparkContext.hadoopConfiguration).exists(p))
      spark.read.parquet(p.toString)
    else default
  }

  /** Recover-then-read: the one way state tables should be loaded. */
  def readOrElse(spark: SparkSession, target: String,
                 default: => DataFrame): DataFrame = {
    recover(spark, target)
    val t = new Path(target)
    if (fsFor(t, spark.sparkContext.hadoopConfiguration).exists(t))
      spark.read.parquet(target)
    else default
  }

  /** Hadoop-FS existence check (works on HDFS/S3A, not just local). */
  def exists(spark: SparkSession, target: String): Boolean = {
    val t = new Path(target)
    fsFor(t, spark.sparkContext.hadoopConfiguration).exists(t)
  }
}
