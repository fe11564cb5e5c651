package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{AstarteValueType, Bson}

/** The native typed BSON decode that replaced the write-sink UDF
  * battery: every Astarte type decodes its own value, rejects the
  * others to null, and the coercion matrix (int→double/long,
  * instant→epoch-millis) matches the reference's column-landing
  * fixtures (`database_test_helper.exs:135-208,256-328`). Run through
  * a DataFrame so the codegen path (doGenCode), not just eval, is
  * what's being tested.
  */
class BsonDecodeTypedSpec extends AnyFunSuite {
  import AstarteValueType._

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def env(v: Any): Array[Byte] = Bson.encode(Seq("v" -> v))

  private def decodeDf(bson: Array[Byte], t: AstarteValueType): Any = {
    import org.apache.spark.sql.graft.ColumnBridge
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(bson)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.BinaryType))))
    df.select(ColumnBridge.column(
      BsonDecodeTyped(ColumnBridge.expression(col("b")), t)).as("out"))
      .collect().head.get(0)
  }

  test("scalar decode + coercion matrix through codegen") {
    assert(decodeDf(env(1.5), ADouble) == 1.5)
    assert(decodeDf(env(7), ADouble) == 7.0, "int widens to double")
    assert(decodeDf(env(7), AInteger) == 7)
    assert(decodeDf(env(7L), ALongInteger) == 7L)
    assert(decodeDf(env(7), ALongInteger) == 7L, "int widens to long")
    assert(decodeDf(env("hi"), AString) == "hi")
    assert(decodeDf(env(true), ABoolean) == true)
    assert(java.util.Arrays.equals(
      decodeDf(env(Array[Byte](1, 2, 3)), ABinaryBlob).asInstanceOf[Array[Byte]],
      Array[Byte](1, 2, 3)))
    val inst = java.time.Instant.ofEpochMilli(1700000000123L)
    assert(decodeDf(env(inst), ADateTime) == 1700000000123L,
      "datetime lands as epoch millis")
    assert(decodeDf(env(inst), ALongInteger) == 1700000000123L,
      "the envelope's longinteger column absorbs instants like the UDF battery did")
  }

  test("wrong-type values and undecodable bytes go to null, not error") {
    assert(decodeDf(env("nope"), ADouble) == null)
    assert(decodeDf(env(1.5), AInteger) == null)
    assert(decodeDf(env(3L), AInteger) == null, "long does NOT narrow to int")
    assert(decodeDf(env(1), AString) == null)
    assert(decodeDf(Array[Byte](1, 2, 3), ADouble) == null, "garbage bytes")
    assert(decodeDf(Bson.encode(Seq("w" -> 1.0)), ADouble) == null, "missing v")
  }

  test("array decode: element-wise coercion, non-coercible elements dropped") {
    assert(decodeDf(env(Seq(1.0, 2, 3L)), ADoubleArray)
      .asInstanceOf[scala.collection.Seq[Double]].toSeq == Seq(1.0, 2.0, 3.0))
    assert(decodeDf(env(Seq("a", 1, "b")), AStringArray)
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a", "b"),
      "non-string elements drop out, like the UDFs' collect")
    assert(decodeDf(env(Seq(1, 2)), AIntegerArray)
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(1, 2))
    assert(decodeDf(env(1.0), ADoubleArray) == null, "scalar is not an array")
  }

  test("object-leaf decode honors the declared mapping type per leaf") {
    import org.apache.spark.sql.graft.ColumnBridge
    val obj = env(Map("temp" -> 21.5, "count" -> 3, "label" -> "x"))
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(obj)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.BinaryType))))
    def leaf(name: String, t: AstarteValueType): Any =
      df.select(ColumnBridge.column(BsonDecodeLeaf(
        ColumnBridge.expression(col("b")),
        ColumnBridge.expression(lit(name)), t)).as("out"))
        .collect().head.get(0)
    assert(leaf("temp", ADouble) == 21.5)
    assert(leaf("count", AInteger) == 3)
    assert(leaf("count", ADouble) == 3.0, "leaf ints widen to declared double")
    assert(leaf("label", AString) == "x")
    assert(leaf("missing", ADouble) == null)
    assert(leaf("temp", AString) == null, "type mismatch is null, not a cast")
  }

  test("output schema matches the former UDF-derived columns") {
    import org.apache.spark.sql.types._
    assert(BsonDecodeTyped.outputType(ADateTime) == LongType,
      "datetimes are stored as epoch-millis longs")
    assert(BsonDecodeTyped.outputType(ADoubleArray) ==
      ArrayType(DoubleType, containsNull = false))
    assert(BsonDecodeTyped.outputType(AStringArray) ==
      ArrayType(StringType, containsNull = true))
    assert(BsonDecodeTyped.outputType(ABinaryBlobArray) ==
      ArrayType(BinaryType, containsNull = true))
  }
}
