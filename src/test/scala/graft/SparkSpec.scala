package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs. One session per JVM (sbt
  * forks a single test JVM), small shuffle-partition count so tiny
  * test data doesn't pay 200-partition scheduling overhead. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  /** Stable identifier so tests can `import spark.implicits._`. */
  final lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
