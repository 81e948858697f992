package graft.util

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

/** Cooperative cancellation — the Spark re-expression of the reference's
  * `*_terminate` endpoints (/root/reference/source/SearchEngineServer.cpp:102-165,
  * WebCrawler.cpp:62-66, InvertedIndex.cpp:66-70): the reference flips an
  * atomic flag its worker loops poll; here in-flight Spark jobs are
  * cancelled task-wide, and index builds resume from the last committed
  * stage (IndexBuilder's checkpointed stages are the `processed`-flag
  * analogue, so cancellation loses at most one stage of work).
  */
object Cancellation {

  /** Cancel-on-exit: SIGINT/SIGTERM cancels in-flight jobs before the JVM
    * dies instead of abandoning executors mid-task. */
  def installShutdownHook(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try if (!sc.isStopped) sc.cancelAllJobs()
      catch { case _: Throwable => () }
    }))
  }

  /** Tag the CURRENT thread's subsequent jobs as `group` (thread-local,
    * like the reference's per-request flag). */
  def tag(sc: SparkContext, group: String): Unit =
    sc.setJobGroup(group, group, interruptOnCancel = true)

  /** Cooperatively cancel every job tagged `group` from any thread. */
  def cancelGroup(spark: SparkSession, group: String): Unit =
    spark.sparkContext.cancelJobGroup(group)
}
