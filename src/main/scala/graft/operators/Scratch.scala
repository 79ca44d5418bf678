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

  def dir(spark: SparkSession, tag: String, sfDir: String): String =
    System.getProperty("java.io.tmpdir", "/tmp") +
      s"/graft_${tag}_${spark.sparkContext.applicationId}/" +
      new java.io.File(sfDir).getName

  /** Run `body` against a fresh scratch dir, eagerly materialize the
    * (small) result it returns, then delete the WHOLE per-application
    * parent (graft_<tag>_<appId>/ is exclusively this session's —
    * removing only the per-fixture leaf would leave empty parents
    * accumulating in the temp dir).
    */
  def withScratch(spark: SparkSession, tag: String, sfDir: String)(
      body: String => DataFrame): DataFrame = {
    val path = dir(spark, tag, sfDir)
    try body(path).localCheckpoint(true)
    finally delete(spark, new java.io.File(path).getParent)
  }

  def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }
}
