package graft.engine

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

/** Property: the CH↔Spark type mapping round-trips every representable
  * Spark type, including arbitrarily nested Array/Map/Struct shapes. */
object TypesProps extends Properties("graft.engine.types") {

  private val scalarGen: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, DateType, BooleanType, DecimalType(10, 2), DecimalType(20, 0))

  // ClickHouse restricts Map keys to String/Integer/Date-like types — keep
  // the generator inside what the target system accepts as DDL, or the
  // property would certify type strings ClickHouse rejects.
  private val mapKeyGen: Gen[DataType] = Gen.oneOf(
    StringType, ByteType, ShortType, IntegerType, LongType, DateType)

  private def dtGen(depth: Int): Gen[DataType] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      4 -> scalarGen,
      1 -> Gen.lzy(dtGen(depth - 1).map(ArrayType(_, containsNull = false))),
      1 -> Gen.lzy(for {
        k <- mapKeyGen; v <- dtGen(depth - 1)
      } yield MapType(k, v, valueContainsNull = false)),
      1 -> Gen.lzy(for {
        n <- Gen.chooseNum(1, 3)
        fields <- Gen.listOfN(n, dtGen(depth - 1))
      } yield StructType(fields.zipWithIndex.map { case (t, i) =>
        StructField(s"f$i", t, nullable = false)
      }))
    )

  property("parse(toClickHouse(dt)) == dt for nested non-null types") =
    Prop.forAll(dtGen(3)) { dt: DataType =>
      ClickHouseTypes.parse(ClickHouseTypes.toClickHouse(dt)).dataType == dt
    }

  property("Nullable round-trips as the nullability flag for scalars") =
    Prop.forAll(scalarGen) { dt: DataType =>
      val p = ClickHouseTypes.parse(ClickHouseTypes.toClickHouse(dt, nullable = true))
      p.dataType == dt && p.nullable
    }

  // ---- DDL-path round trip (the Derby-executed sink's rendering) --------
  // The two properties above exercise toClickHouse directly; this one goes
  // through the FULL CREATE TABLE string Sinks.clickHouseDdl actually emits
  // (the reference's target-DDL assembly, server.js:586-601), then recovers
  // every column through splitTopLevel + parse — certifying that the
  // rendered column list is itself parseable and lossless for everything
  // the wrapper rules can represent (a nullable composite field is
  // rendered bare by design: ClickHouse forbids Nullable(Array/Map/Tuple)).
  private def isComposite(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }
  private val schemaGen: Gen[StructType] = for {
    n <- Gen.chooseNum(1, 5)
    dts <- Gen.listOfN(n, dtGen(2))
    nulls <- Gen.listOfN(n, Gen.oneOf(true, false))
  } yield StructType(dts.zip(nulls).zipWithIndex.map { case ((dt, nl), i) =>
    StructField(s"c$i", dt, nullable = nl && !isComposite(dt))
  })

  property("clickHouseDdl column list parses back to the source schema") =
    Prop.forAll(schemaGen) { schema: StructType =>
      val spark = graft.TestSpark.spark
      val df = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      val ddl = Sinks.clickHouseDdl("t_roundtrip", df)
      val open = ddl.indexOf('(')
      val close = ddl.lastIndexOf(") ENGINE = ")
      val cols = ClickHouseTypes.splitTopLevel(ddl.substring(open + 1, close))
      cols.length == schema.length && cols.zip(schema.fields).forall {
        case (colDef, f) =>
          val sp = colDef.indexOf(' ')
          val (nm, ty) = (colDef.take(sp), colDef.drop(sp + 1))
          val p = ClickHouseTypes.parse(ty)
          nm == f.name && p.dataType == f.dataType && p.nullable == f.nullable
      }
    }

  // ---- §1.2 fixpoint: the FIXTURES/SURVEY ClickHouse type table ---------
  // For every CH type string the reference declares (mapClickHouseType,
  // server.js:57-85, incl. the parameterized spellings DESCRIBE actually
  // returns), parse → toClickHouse → parse must reach a FIXPOINT: the
  // second parse yields the same Spark type + nullability as the first.
  // (The mapping itself is many-to-one — FixedString/Enum/UUID collapse to
  // String — so a string-level round trip is not the contract; type-level
  // idempotence is.)
  private val survey12Types = Seq(
    "UInt8", "UInt16", "UInt32", "UInt64",
    "Int8", "Int16", "Int32", "Int64",
    "Float32", "Float64", "String", "FixedString(16)",
    "Date", "Date32", "DateTime", "DateTime64(3)", "Bool",
    "Array(Int32)", "Array(Nullable(String))",
    "Tuple(a String, b Int32)", "Tuple(String, Int64)",
    "Nullable(String)", "Nullable(DateTime64(6))",
    "LowCardinality(String)", "LowCardinality(Nullable(String))",
    "Enum8('a' = 1, 'b' = 2)", "Enum16('x' = 1)",
    "UUID", "IPv4", "IPv6", "Decimal(10, 2)", "Decimal(20, 0)",
    "Map(String, Int64)", "SomeFutureType")

  property("parse -> toClickHouse -> parse is a fixpoint over the §1.2 table") =
    Prop.forAll(Gen.oneOf(survey12Types)) { ch: String =>
      val p1 = ClickHouseTypes.parse(ch)
      val p2 = ClickHouseTypes.parse(
        ClickHouseTypes.toClickHouse(p1.dataType, p1.nullable))
      p2 == p1
    }
}
