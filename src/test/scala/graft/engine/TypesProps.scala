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
}
