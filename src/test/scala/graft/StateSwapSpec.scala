package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StateSwap

/** Crash-safety contract of the shared state-swap primitive: every
  * interruption point between "staging written" and "debris deleted"
  * must recover to the NEW state, and an interrupted staging write (no
  * marker yet) must fall back to the OLD state — never a cold start,
  * never a partial directory.
  */
class StateSwapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def df(v: Int): DataFrame = {
    import spark.implicits._
    Seq((v, s"gen$v")).toDF("gen", "tag")
  }

  private def readGen(target: String): Int =
    StateSwap.readOrElse(spark, target, df(-1)).select("gen").collect()(0).getInt(0)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/state"

  test("swap replaces old state and cleans up all side files") {
    val t = tmp("swap_basic")
    StateSwap.swap(df(1), t)
    StateSwap.swap(df(2), t)
    assert(readGen(t) == 2)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(t + ".staging")))
    assert(!fs.exists(new Path(t + ".old")))
    assert(!fs.exists(new Path(t + ".swap")))
  }

  test("crash after marker, before any rename → recovers to NEW state") {
    val t = tmp("swap_crash1")
    StateSwap.swap(df(1), t)
    // simulate: staging fully written + marker created, then death
    df(2).write.parquet(t + ".staging")
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new Path(t + ".swap"), true).close()
    assert(readGen(t) == 2)
    assert(!fs.exists(new Path(t + ".swap")))
  }

  test("crash between the two renames → recovers to NEW state") {
    val t = tmp("swap_crash2")
    StateSwap.swap(df(1), t)
    df(2).write.parquet(t + ".staging")
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new Path(t + ".swap"), true).close()
    assert(fs.rename(new Path(t), new Path(t + ".old"))) // died right here
    assert(readGen(t) == 2)
    assert(!fs.exists(new Path(t + ".old")))
  }

  test("crash after promotion, before cleanup → NEW state, debris removed") {
    val t = tmp("swap_crash3")
    StateSwap.swap(df(1), t)
    df(2).write.parquet(t + ".staging")
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new Path(t + ".swap"), true).close()
    assert(fs.rename(new Path(t), new Path(t + ".old")))
    assert(fs.rename(new Path(t + ".staging"), new Path(t))) // died right here
    assert(readGen(t) == 2)
    assert(!fs.exists(new Path(t + ".old")) && !fs.exists(new Path(t + ".swap")))
  }

  test("crash DURING staging write (no marker) → old state survives") {
    val t = tmp("swap_partial")
    StateSwap.swap(df(1), t)
    // a half-written staging dir with no marker must be discarded
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(t + ".staging"))
    fs.create(new Path(t + ".staging/part-00000.parquet"), true).close()
    assert(readGen(t) == 1)
    assert(!fs.exists(new Path(t + ".staging")))
  }

  test("cold start: readOrElse returns the default when nothing exists") {
    val t = tmp("swap_cold")
    assert(readGen(t) == -1)
  }

  private def readTableGen(root: String, name: String): Int =
    StateSwap.readTableOrElse(spark, root, name, df(-1))
      .select("gen").collect()(0).getInt(0)

  test("swapAll: a group of tables advances atomically, reading current state while staging") {
    val t = tmp("swapall_basic")
    StateSwap.swapAll(t, Seq("a" -> df(1), "b" -> df(10)))
    // the staged generation-2 writes READ the generation-1 tables (the
    // state-merge shape): union old with new, then promote the root once
    val mergedA = StateSwap.readTableOrElse(spark, t, "a", df(-1)).unionByName(df(2))
    val mergedB = StateSwap.readTableOrElse(spark, t, "b", df(-1)).unionByName(df(20))
    StateSwap.swapAll(t, Seq("a" -> mergedA, "b" -> mergedB))
    assert(StateSwap.readTableOrElse(spark, t, "a", df(-1)).count() == 2)
    assert(StateSwap.readTableOrElse(spark, t, "b", df(-1)).count() == 2)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(t + ".staging")) && !fs.exists(new Path(t + ".old")) &&
      !fs.exists(new Path(t + ".swap")))
  }

  test("swapAll crash between renames → ALL tables recover to the NEW generation together") {
    val t = tmp("swapall_crash")
    StateSwap.swapAll(t, Seq("a" -> df(1), "b" -> df(10)))
    // simulate: both tables staged + marker written, death mid-promotion
    df(2).write.parquet(t + ".staging/a")
    df(20).write.parquet(t + ".staging/b")
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new Path(t + ".swap"), true).close()
    assert(fs.rename(new Path(t), new Path(t + ".old"))) // died right here
    // recovery promotes the whole root: no state where a sees gen2 but b gen10
    assert(readTableGen(t, "a") == 2 && readTableGen(t, "b") == 20)
  }

  test("swapAll crash during staging (no marker) → ALL tables stay at the OLD generation") {
    val t = tmp("swapall_partial")
    StateSwap.swapAll(t, Seq("a" -> df(1), "b" -> df(10)))
    // only table a staged when the process died — no marker yet
    df(2).write.parquet(t + ".staging/a")
    assert(readTableGen(t, "a") == 1 && readTableGen(t, "b") == 10)
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(t + ".staging")))
  }
}
