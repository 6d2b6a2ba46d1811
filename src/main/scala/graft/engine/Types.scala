package graft.engine

import org.apache.spark.sql.types._

/** ClickHouse ↔ Spark type mapping.
  *
  * The reference declares its type surface in `mapClickHouseType`
  * (reference/server/server.js:57-85): an exact-string identity map with a
  * String fallback. Because ClickHouse `DESCRIBE` returns *parameterized*
  * strings (`Nullable(String)`, `DateTime64(3)`, `Array(Int32)`), every
  * wrapped type collapses to `String` in the reference's generated DDL
  * (SURVEY.md §1.2). We keep that behavior available as [[referenceCollapse]]
  * for fidelity, and provide a real recursive parser ([[parse]]) that a Spark
  * engine actually needs.
  */
object ClickHouseTypes {

  /** Result of parsing one ClickHouse type string. */
  final case class Parsed(dataType: DataType, nullable: Boolean)

  /** The reference's literal behavior: exact-match on the bare type name,
    * `String` for everything else (reference/server/server.js:57-85). */
  def referenceCollapse(chType: String): String = {
    val known = Set(
      "UInt8", "UInt16", "UInt32", "UInt64",
      "Int8", "Int16", "Int32", "Int64",
      "Float32", "Float64", "String", "FixedString",
      "Date", "DateTime", "DateTime64",
      "Array", "Tuple", "Nullable", "LowCardinality",
      "Enum8", "Enum16", "UUID", "IPv4", "IPv6")
    if (known.contains(chType)) chType else "String"
  }

  /** Full parser: handles Nullable/LowCardinality wrappers, parametric types,
    * Array/Tuple/Map nesting. Unknown types map to StringType (the reference's
    * fallback, kept deliberately). */
  def parse(chType: String): Parsed = {
    val t = chType.trim
    def inner(name: String): String = {
      val i = t.indexOf('(')
      t.substring(i + 1, t.lastIndexOf(')'))
    }
    t match {
      case _ if t.startsWith("Nullable(") =>
        parse(inner("Nullable")).copy(nullable = true)
      case _ if t.startsWith("LowCardinality(") =>
        // An encoding hint, not a logical type; parquet dictionary-encodes
        // automatically, so we pass through to the inner type.
        parse(inner("LowCardinality"))
      case _ if t.startsWith("Array(") =>
        val p = parse(inner("Array"))
        Parsed(ArrayType(p.dataType, containsNull = p.nullable), nullable = false)
      case _ if t.startsWith("Map(") =>
        val parts = splitTopLevel(inner("Map"))
        val k = parse(parts(0)); val v = parse(parts(1))
        Parsed(MapType(k.dataType, v.dataType, valueContainsNull = v.nullable), nullable = false)
      case _ if t.startsWith("Tuple(") =>
        val parts = splitTopLevel(inner("Tuple"))
        val fields = parts.zipWithIndex.map { case (p, i) =>
          // Named-tuple element: "name Type"; positional otherwise.
          val trimmed = p.trim
          val sp = trimmed.indexOf(' ')
          val (nm, ty) =
            if (sp > 0 && !trimmed.take(sp).exists(c => c == '(' || c == ',') &&
                parseSimpleName(trimmed.take(sp)))
              (trimmed.take(sp), trimmed.drop(sp + 1))
            else (s"_${i + 1}", trimmed)
          val pr = parse(ty)
          StructField(nm, pr.dataType, pr.nullable)
        }
        Parsed(StructType(fields), nullable = false)
      case _ if t.startsWith("Decimal(") =>
        val parts = splitTopLevel(inner("Decimal")).map(_.trim.toInt)
        Parsed(DecimalType(parts(0), parts(1)), nullable = false)
      case _ if t.startsWith("DateTime64") => Parsed(TimestampType, nullable = false)
      case _ if t.startsWith("DateTime")   => Parsed(TimestampType, nullable = false)
      case _ if t.startsWith("FixedString") => Parsed(StringType, nullable = false)
      case _ if t.startsWith("Enum8") || t.startsWith("Enum16") =>
        Parsed(StringType, nullable = false)
      case "UInt8"   => Parsed(ShortType, nullable = false)   // 0..255 overflows ByteType
      case "UInt16"  => Parsed(IntegerType, nullable = false)
      case "UInt32"  => Parsed(LongType, nullable = false)
      case "UInt64"  => Parsed(DecimalType(20, 0), nullable = false) // exceeds signed 64-bit
      case "Int8"    => Parsed(ByteType, nullable = false)
      case "Int16"   => Parsed(ShortType, nullable = false)
      case "Int32"   => Parsed(IntegerType, nullable = false)
      case "Int64"   => Parsed(LongType, nullable = false)
      case "Float32" => Parsed(FloatType, nullable = false)
      case "Float64" => Parsed(DoubleType, nullable = false)
      case "Date" | "Date32" => Parsed(DateType, nullable = false)
      case "Bool"    => Parsed(BooleanType, nullable = false)
      case "String" | "UUID" | "IPv4" | "IPv6" => Parsed(StringType, nullable = false)
      case _ => Parsed(StringType, nullable = false) // reference fallback semantics
    }
  }

  private def parseSimpleName(s: String): Boolean =
    s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_')

  /** Split on commas at paren depth 0, respecting single-quoted strings
    * (Enum8('a' = 1, 'b' = 2)). */
  private[engine] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) {
        cur += c
        if (c == '\'' ) inQuote = false
      } else c match {
        case '\'' => inQuote = true; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.result().trim; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.result().trim
    out.result()
  }

  /** Spark → ClickHouse type string, for generated target DDL (the Spark-side
    * analog of the reference's CREATE TABLE assembly, server.js:586-589). */
  def toClickHouse(dt: DataType, nullable: Boolean = false): String = {
    val base = dt match {
      case ByteType      => "Int8"
      case ShortType     => "Int16"
      case IntegerType   => "Int32"
      case LongType      => "Int64"
      case FloatType     => "Float32"
      case DoubleType    => "Float64"
      case _: StringType => "String"
      case BooleanType   => "Bool"
      case DateType      => "Date"
      case TimestampType | TimestampNTZType => "DateTime64(6)"
      case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
      case a: ArrayType  => s"Array(${toClickHouse(a.elementType, a.containsNull)})"
      case m: MapType    => s"Map(${toClickHouse(m.keyType)}, ${toClickHouse(m.valueType, m.valueContainsNull)})"
      case s: StructType =>
        s.fields.map(f => s"${f.name} ${toClickHouse(f.dataType, f.nullable)}")
          .mkString("Tuple(", ", ", ")")
      case BinaryType    => "String"
      case _             => "String"
    }
    // Nullable cannot wrap composite types in ClickHouse.
    if (nullable && !base.startsWith("Array(") && !base.startsWith("Map(") &&
        !base.startsWith("Tuple(")) s"Nullable($base)" else base
  }
}
