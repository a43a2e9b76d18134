package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, stopped after). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession =
    GraftSession.install(
      GraftSession.builder(master = "local[4]", shufflePartitions = 4)
        .config("spark.sql.warehouse.dir",
          s"/tmp/graft-test-warehouse-${getClass.getSimpleName}")
        .getOrCreate())

  override protected def afterAll(): Unit = {
    // keep the session alive across suites in the same JVM (sbt forks
    // one JVM for all tests); getOrCreate reuses it
    super.afterAll()
  }

  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}
