package graft.table

import graft.core.TableSchema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Computed columns derived at WRITE time from other columns — the
  * reference's CDC computed-column surface (paimon-flink-cdc
  * `Expression.java:58-144` — YEAR/MONTH/DAY/HOUR/MINUTE/SECOND,
  * DATE_FORMAT, SUBSTRING, TRUNCATE, CAST; `ComputedColumn.java`), most
  * commonly used to derive a partition column from an event timestamp.
  *
  * Declared as a table option:
  * {{{
  * computed-columns = pt=year(event_time), hh=hour(event_time)
  * }}}
  * Each target must be a schema column; the expression overwrites whatever
  * the writer supplied for it (the column may be entirely absent from the
  * input frame). Everything compiles to built-in Catalyst expressions —
  * whole-stage codegen, no UDFs.
  */
object ComputedColumns {

  val Opt = "computed-columns"

  /** target -> column expression, parsed from the option value. Entries
    * split on TOP-LEVEL commas only (function arguments keep theirs).
    */
  def parse(spec: String, typeOf: String => Option[String] = _ => None): Seq[(String, Column)] = {
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    spec.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => entries += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) entries += cur.toString
    entries.map(_.trim).filter(_.nonEmpty).toSeq.map { one =>
      val eq = one.indexOf('=')
      require(eq > 0, s"computed-columns entry needs 'target=expr(...)': $one")
      val target = one.take(eq).trim
      val expr = one.drop(eq + 1).trim
      target -> compile(expr, typeOf)
    }
  }

  private val Call = """(?i)([a-z_]+)\s*\(\s*([^)]*)\s*\)""".r

  private def compile(expr: String, typeOf: String => Option[String]): Column = expr match {
    case Call(fn, argStr) =>
      val args = argStr.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      def field = col(args.head)
      fn.toLowerCase match {
        case "year" => year(field)
        case "month" => month(field)
        case "day" => dayofmonth(field)
        case "hour" => hour(field)
        case "minute" => minute(field)
        case "second" => second(field)
        case "date_format" =>
          require(args.size == 2, s"date_format(field, 'fmt'): $expr")
          date_format(field, unquote(args(1)))
        case "substring" =>
          // reference semantics: substring(field, beginInclusive[, endExclusive])
          require(args.size >= 2, s"substring(field, begin[, end]): $expr")
          val begin = args(1).toInt
          if (args.size > 2) substring(field, begin, args(2).toInt - begin)
          else field.substr(lit(begin), length(field))
        case "truncate" =>
          // numeric: round down to a multiple of width (floor division, so
          // negatives bucket correctly); string: keep the first width chars
          // (reference: Expression.truncate / TruncateComputer)
          require(args.size == 2, s"truncate(field, width): $expr")
          val w = args(1).toInt
          typeOf(args.head).map(_.toLowerCase) match {
            case Some(t) if t.contains("string") || t.contains("char") =>
              substring(field, 1, w)
            case _ => floor(field.cast("double") / w).cast("long") * w
          }
        case "cast" =>
          require(args.size == 2, s"cast(field, 'type'): $expr")
          field.cast(unquote(args(1)))
        case other =>
          throw new IllegalArgumentException(s"unknown computed-column function: $other")
      }
    case bare if bare.nonEmpty && !bare.contains('(') => col(bare)
    case other => throw new IllegalArgumentException(s"cannot parse computed column: $other")
  }

  private def unquote(s: String): String =
    s.stripPrefix("'").stripSuffix("'").stripPrefix("\"").stripSuffix("\"")

  /** Apply a table's computed-column option to an input frame (no-op when
    * the option is absent). Targets must exist in the schema; the computed
    * value is cast to the declared column type.
    */
  def apply(schema: TableSchema, df: DataFrame): DataFrame =
    schema.options.get(Opt) match {
      case None => df
      case Some(spec) =>
        val typeOf: String => Option[String] =
          n => schema.fields.find(_.name == n).map(_.dataType)
        parse(spec, typeOf).foldLeft(df) { case (acc, (target, expr)) =>
          val f = schema.fieldByName(target)
          acc.withColumn(target, expr.cast(f.sparkType))
        }
    }
}
