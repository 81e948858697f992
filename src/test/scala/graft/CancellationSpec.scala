package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

class CancellationSpec extends AnyFunSuite {
  lazy val spark = EngineSpecFixture.spark

  test("cancelGroup aborts an in-flight tagged job") {
    import spark.implicits._
    val f = Future {
      graft.util.Cancellation.tag(spark.sparkContext, "slow-test-job")
      try
        spark.range(0, 1000000L).as[Long].mapPartitions { it =>
          Thread.sleep(60000)
          it
        }.count()
      finally spark.sparkContext.clearJobGroup()
    }
    // wait until the tagged job is actually running, then cancel it
    val st = spark.sparkContext.statusTracker
    val deadline = System.currentTimeMillis() + 60000
    while (st.getJobIdsForGroup("slow-test-job").isEmpty &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(st.getJobIdsForGroup("slow-test-job").nonEmpty, "job never started")
    graft.util.Cancellation.cancelGroup(spark, "slow-test-job")
    val r = Await.ready(f, 60.seconds).value.get
    assert(r.isFailure, "cancelled job must not complete normally")
  }
}
