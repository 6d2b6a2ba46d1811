package graft.engine

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** ClickHouse ↔ Spark type mapping (SURVEY.md §1.2; reference behavior at
  * reference/server/server.js:57-85). */
class TypesSpec extends AnyFunSuite {
  import ClickHouseTypes._

  test("referenceCollapse: exact match passes through, anything else → String") {
    assert(referenceCollapse("UInt32") == "UInt32")
    assert(referenceCollapse("DateTime64") == "DateTime64")
    // Parameterized strings never match the bare keys — the reference
    // collapses them to String (server.js:84).
    assert(referenceCollapse("Nullable(String)") == "String")
    assert(referenceCollapse("DateTime64(3)") == "String")
    assert(referenceCollapse("Array(Int32)") == "String")
    assert(referenceCollapse("LowCardinality(String)") == "String")
    assert(referenceCollapse("SomethingNew") == "String")
  }

  test("parse: scalar types") {
    assert(parse("UInt8") == Parsed(ShortType, nullable = false))   // 0..255
    assert(parse("UInt16") == Parsed(IntegerType, nullable = false))
    assert(parse("UInt32") == Parsed(LongType, nullable = false))
    assert(parse("UInt64") == Parsed(DecimalType(20, 0), nullable = false))
    assert(parse("Int8") == Parsed(ByteType, nullable = false))
    assert(parse("Int64") == Parsed(LongType, nullable = false))
    assert(parse("Float32") == Parsed(FloatType, nullable = false))
    assert(parse("Float64") == Parsed(DoubleType, nullable = false))
    assert(parse("Date") == Parsed(DateType, nullable = false))
    assert(parse("DateTime") == Parsed(TimestampType, nullable = false))
    assert(parse("DateTime64(3)") == Parsed(TimestampType, nullable = false))
    assert(parse("UUID") == Parsed(StringType, nullable = false))
    assert(parse("IPv6") == Parsed(StringType, nullable = false))
    assert(parse("FixedString(16)") == Parsed(StringType, nullable = false))
    assert(parse("Enum8('a' = 1, 'b' = 2)") == Parsed(StringType, nullable = false))
  }

  test("parse: Nullable is a field flag, not a wrapper type") {
    assert(parse("Nullable(Int32)") == Parsed(IntegerType, nullable = true))
    assert(parse("Nullable(DateTime64(6))") == Parsed(TimestampType, nullable = true))
  }

  test("parse: LowCardinality is an encoding hint — passes through") {
    assert(parse("LowCardinality(String)") == Parsed(StringType, nullable = false))
    assert(parse("LowCardinality(Nullable(String))") == Parsed(StringType, nullable = true))
  }

  test("parse: nested Array / Map / Tuple") {
    assert(parse("Array(Int32)") ==
      Parsed(ArrayType(IntegerType, containsNull = false), nullable = false))
    assert(parse("Array(Nullable(String))") ==
      Parsed(ArrayType(StringType, containsNull = true), nullable = false))
    assert(parse("Map(String, UInt32)") ==
      Parsed(MapType(StringType, LongType, valueContainsNull = false), nullable = false))
    assert(parse("Tuple(Int32, String)") ==
      Parsed(StructType(Seq(
        StructField("_1", IntegerType, nullable = false),
        StructField("_2", StringType, nullable = false))), nullable = false))
    assert(parse("Tuple(x Int32, y Float64)") ==
      Parsed(StructType(Seq(
        StructField("x", IntegerType, nullable = false),
        StructField("y", DoubleType, nullable = false))), nullable = false))
    assert(parse("Array(Tuple(a String, b Array(Int64)))") ==
      Parsed(ArrayType(StructType(Seq(
        StructField("a", StringType, nullable = false),
        StructField("b", ArrayType(LongType, containsNull = false), nullable = false))),
        containsNull = false), nullable = false))
  }

  test("parse: Decimal and unknown fallback") {
    assert(parse("Decimal(10, 2)") == Parsed(DecimalType(10, 2), nullable = false))
    assert(parse("AggregateFunction(sum, Int64)") ==
      Parsed(StringType, nullable = false)) // reference String fallback
  }

  test("splitTopLevel respects parens and quoted commas") {
    assert(splitTopLevel("Int32, String") == Seq("Int32", "String"))
    assert(splitTopLevel("Tuple(Int32, String), Float64") ==
      Seq("Tuple(Int32, String)", "Float64"))
    assert(splitTopLevel("Enum8('a,b' = 1, 'c' = 2), Int8") ==
      Seq("Enum8('a,b' = 1, 'c' = 2)", "Int8"))
  }

  test("toClickHouse: scalars, nullability, composites") {
    assert(toClickHouse(IntegerType) == "Int32")
    assert(toClickHouse(StringType, nullable = true) == "Nullable(String)")
    assert(toClickHouse(ArrayType(DoubleType)) == "Array(Nullable(Float64))")
    assert(toClickHouse(ArrayType(DoubleType, containsNull = false)) == "Array(Float64)")
    // Nullable cannot wrap composites in ClickHouse.
    assert(toClickHouse(ArrayType(LongType, containsNull = false), nullable = true) == "Array(Int64)")
    assert(toClickHouse(DecimalType(20, 0)) == "Decimal(20, 0)")
    assert(toClickHouse(StructType(Seq(StructField("a", LongType, nullable = false)))) ==
      "Tuple(a Int64)")
  }

  test("parse ∘ toClickHouse round-trips the scalar core") {
    val dts: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType,
      FloatType, DoubleType, StringType, DateType, BooleanType)
    for (dt <- dts)
      assert(parse(toClickHouse(dt)).dataType == dt, s"round-trip $dt")
  }
}
