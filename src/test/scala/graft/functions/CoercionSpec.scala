package graft.functions

import graft.SparkSpec
import graft.io.VdfIO
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CoercionSpec extends SparkSpec {

  test("filterMetadataTypes keeps scalars + id, drops arrays/structs (P8)") {
    import spark.implicits._
    val df = Seq((("1"), "t", 5L, 1.5, true, Array(1f)))
      .toDF("id", "s", "l", "d", "b", "vec")
    val kept = CleaningFunctions.filterMetadataTypes(df, "id")
    assert(kept.columns.toSet == Set("id", "s", "l", "d", "b"))
  }

  test("defaultValueFor matches lancedb defaults (F19)") {
    assert(CleaningFunctions.defaultValueFor(StringType) == "")
    assert(CleaningFunctions.defaultValueFor(LongType) == 0L)
    assert(CleaningFunctions.defaultValueFor(DoubleType) == 0.0)
    assert(CleaningFunctions.defaultValueFor(BooleanType) == false)
    assert(CleaningFunctions.defaultValueFor(TimestampType) == null)
  }

  test("coerceAttributeColumn: all-uint survives, negative stringifies (F21)") {
    import spark.implicits._
    def arrCol(df: org.apache.spark.sql.DataFrame) =
      df.collect().head.getAs[scala.collection.Seq[Any]]("a")
    val uints = Seq(Tuple1(Seq(1L, 2L))).toDF("a")
    assert(arrCol(CleaningFunctions.coerceAttributeColumn(uints, "a")) == Seq(1L, 2L))
    val signed = Seq(Tuple1(Seq(1L, -2L))).toDF("a")
    assert(arrCol(CleaningFunctions.coerceAttributeColumn(signed, "a")) == Seq("1", "-2"))
    val strs = Seq(Tuple1(Seq("a", "1"))).toDF("a")
    assert(arrCol(CleaningFunctions.coerceAttributeColumn(strs, "a")) == Seq("a", "1"))
    val doubles = Seq(Tuple1(Seq(1.5, 2.5))).toDF("a")
    assert(arrCol(CleaningFunctions.coerceAttributeColumn(doubles, "a")) == Seq("1.5", "2.5"))
  }

  test("multiVectorJoin covers union of ids with [] for absent vectors (J2)") {
    import spark.implicits._
    val a = Seq(("1", Array(1f)), ("2", Array(2f))).toDF("id", "vec_a")
    val b = Seq(("2", Array(2f, 2f)), ("3", Array(3f, 3f))).toDF("id", "vec_b")
    val j = VdfIO.multiVectorJoin(Seq(a, b))
    assert(j.count() == 3)
    val r1 = j.filter(col("id") === "1").collect().head
    assert(r1.getAs[scala.collection.Seq[Float]]("vec_b").isEmpty)
    val r3 = j.filter(col("id") === "3").collect().head
    assert(r3.getAs[scala.collection.Seq[Float]]("vec_a").isEmpty)
    assert(r3.getAs[scala.collection.Seq[Float]]("vec_b") == Seq(3f, 3f))
  }

  test("expandShorthandPath resolves ~ and relative segments (F23)") {
    val home = System.getProperty("user.home")
    assert(HashFunctions.expandShorthandPath("~") == home)
    assert(HashFunctions.expandShorthandPath("~/x") == s"$home/x")
    assert(HashFunctions.expandShorthandPath("/a/b/../c") == "/a/c")
  }

  test("versionNewer compares numeric segments (F26)") {
    assert(HashFunctions.versionNewer("0.1.248", "0.1.247"))
    assert(!HashFunctions.versionNewer("0.1.247", "0.1.247"))
    assert(!HashFunctions.versionNewer("0.1.9", "0.2.0"))
    assert(HashFunctions.versionNewer("1.0", "0.9.9"))
  }
}
