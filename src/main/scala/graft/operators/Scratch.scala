package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-application scratch directories for the lifecycle entries that
  * render their own inputs (the q19 device, also q46/q59/q63/q64):
  * unique via `applicationId` so concurrent verify/bench sessions
  * never race, and deleted by [[withScratch]] once the caller's
  * result is materialized — sessions stop accumulating fixture copies
  * in the temp dir. Local-mode layout; a production pipeline writes
  * these artifacts to a shared filesystem and KEEPS them.
  */
object Scratch {

  private val invocation = new java.util.concurrent.atomic.AtomicLong

  def dir(spark: SparkSession, tag: String, sfDir: String): String =
    System.getProperty("java.io.tmpdir", "/tmp") +
      s"/graft_${tag}_${spark.sparkContext.applicationId}/" +
      new java.io.File(sfDir).getName

  /** Run `body` against a fresh scratch dir, eagerly materialize the
    * (small) result it returns, then delete the scratch. The leaf is
    * unique PER INVOCATION (counter suffix) and only the leaf is
    * removed — deleting the shared per-tag parent would destroy the
    * in-flight files of a CONCURRENT invocation of the same operator
    * on a different fixture dir (parallel test suites do exactly
    * this). The parent is swept with a non-recursive delete that
    * only succeeds once the last leaf is gone.
    */
  def withScratch(spark: SparkSession, tag: String, sfDir: String)(
      body: String => DataFrame): DataFrame = {
    val path = dir(spark, tag, sfDir) + s"_${invocation.incrementAndGet()}"
    try body(path).localCheckpoint(true)
    finally {
      delete(spark, path)
      val parent = new org.apache.hadoop.fs.Path(
        new java.io.File(path).getParent)
      // empty-parent sweep: fails (harmlessly) while siblings exist
      try parent.getFileSystem(spark.sessionState.newHadoopConf())
        .delete(parent, false)
      catch { case _: java.io.IOException => () }
    }
  }

  def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }
}
