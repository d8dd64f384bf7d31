package graft.core

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import java.sql.{Date, Timestamp}

/** Typed encode/compare for stats values. Stats are stored as strings:
  * integral → decimal string, floating → toString, timestamp → epoch micros,
  * date → epoch days, string → raw, boolean → true/false.
  */
object StatsCodec {

  /** Encode a value collected from a Spark Row (external types) for storage. */
  def encode(dt: DataType, v: Any): Option[String] = Option(v).map { x =>
    dt match {
      case TimestampType | TimestampNTZType => x match {
        case t: Timestamp => (t.getTime * 1000L + (t.getNanos / 1000) % 1000).toString
        case t: java.time.Instant =>
          (t.getEpochSecond * 1000000L + t.getNano / 1000).toString
        case t: java.time.LocalDateTime => // TimestampNTZ external type
          (t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000).toString
        case other => other.toString
      }
      case DateType => x match {
        case d: Date => d.toLocalDate.toEpochDay.toString
        case d: java.time.LocalDate => d.toEpochDay.toString
        case other => other.toString
      }
      case _ => x.toString
    }
  }

  /** Timestamp stat string → epoch micros. Canonical encoding is a decimal
    * epoch-micros string; manifests written before TimestampNTZ encoding was
    * fixed hold ISO LocalDateTime strings (`LocalDateTime.toString`), so
    * accept both — otherwise every NTZ stat would silently stop skipping.
    */
  private def tsMicros(s: String): Option[Long] =
    try Some(s.toLong)
    catch {
      case _: NumberFormatException =>
        try {
          val t = java.time.LocalDateTime.parse(s)
          Some(t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000)
        } catch { case _: java.time.format.DateTimeParseException => None }
    }

  /** Comparable key for a stored stat string under the column's type.
    * Returns None for types we don't order (complex, binary).
    */
  def toComparable(dt: DataType, s: String): Option[Comparable[Any]] = {
    try {
      val c: Comparable[_] = dt match {
        case TimestampType | TimestampNTZType => tsMicros(s) match {
          case Some(l) => java.lang.Long.valueOf(l)
          case None => return None
        }
        case ByteType | ShortType | IntegerType | LongType | DateType =>
          java.lang.Long.valueOf(s.toLong)
        case FloatType | DoubleType => java.lang.Double.valueOf(s.toDouble)
        case _: DecimalType => new java.math.BigDecimal(s)
        case StringType => s
        case BooleanType => java.lang.Boolean.valueOf(s)
        case _ => return None
      }
      Some(c.asInstanceOf[Comparable[Any]])
    } catch { case _: NumberFormatException => None }
  }

  /** Encode a literal from a Spark Filter (external types: java.sql.Timestamp,
    * Instant, Date, numbers, strings) to the same comparable domain.
    */
  def literal(dt: DataType, v: Any): Option[Comparable[Any]] = {
    if (v == null) return None
    val enc = encode(dt, v)
    enc.flatMap(toComparable(dt, _))
  }

  /** Comparable key for a partition value, which is stored in its Spark
    * partition-path form (dates as yyyy-MM-dd, timestamps as
    * yyyy-MM-dd HH:mm:ss[.fff]) rather than the stats encoding.
    */
  def partitionComparable(dt: DataType, s: String): Option[Comparable[Any]] = {
    try {
      val c: Comparable[_] = dt match {
        case DateType => java.lang.Long.valueOf(java.time.LocalDate.parse(s).toEpochDay)
        case TimestampType | TimestampNTZType =>
          val t = Timestamp.valueOf(s)
          java.lang.Long.valueOf(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
        case _ => return toComparable(dt, s)
      }
      Some(c.asInstanceOf[Comparable[Any]])
    } catch { case _: RuntimeException => None }
  }
}

/** Evaluates Spark data-source Filters against per-file ColStats (min/max/
  * nullCount) and against partition values — the file-skipping and
  * partition-pruning core (reference: paimon-core
  * KeyValueFileStoreScan.filterByStats:103, SnapshotReaderImpl.withFilter:158;
  * predicate stats test mirrors paimon-common predicate/Predicate.java:35-50).
  *
  * Semantics: `mightMatch == false` means NO row in the file can satisfy the
  * filter; true means "cannot rule out".
  */
object Pruning {

  /** Partial evaluation of [[mightMatch]]: resolve column types and encode
    * the filter's literals ONCE, returning a closure evaluated per file
    * that only parses the file's own min/max strings. At planning scale
    * this matters — a stats-filtered plan over 10⁶ manifest entries spent
    * 8.5 s re-running `typeOf` and `StatsCodec.literal` per file per leaf
    * through the interpreted path. Exactly equivalent to [[mightMatch]]
    * (property-tested in PruningPropertySpec); shapes not compiled here
    * (Not/EqualNullSafe/StringStartsWith) fall back to the interpreter,
    * which resolves nothing hot for them.
    */
  def compileMight(f: Filter, typeOf: String => Option[DataType])
      : (Map[String, ColStats], Long) => Boolean = {
    // leaf compiler: one (min, max, literal) comparison, types + literal
    // pre-resolved; any resolution miss degrades to "keep the file",
    // exactly like the interpreted (range, lit) match falling through
    def leaf(c: String, v: Any)(
        test: (Option[Comparable[Any]], Option[Comparable[Any]],
               Comparable[Any]) => Boolean)
        : (Map[String, ColStats], Long) => Boolean =
      typeOf(c).flatMap(dt => StatsCodec.literal(dt, v).map(dt -> _)) match {
        case Some((dt, l)) => (stats, _) => stats.get(c) match {
          case Some(cs) => test(
            cs.min.flatMap(StatsCodec.toComparable(dt, _)),
            cs.max.flatMap(StatsCodec.toComparable(dt, _)), l)
          case None => true
        }
        case None => (_, _) => true
      }
    f match {
      case And(l, r) =>
        val (cl, cr) = (compileMight(l, typeOf), compileMight(r, typeOf))
        (s, rc) => cl(s, rc) && cr(s, rc)
      case Or(l, r) =>
        val (cl, cr) = (compileMight(l, typeOf), compileMight(r, typeOf))
        (s, rc) => cl(s, rc) || cr(s, rc)
      case EqualTo(c, v) => leaf(c, v)((mn, mx, l) =>
        mn.forall(_.compareTo(l) <= 0) && mx.forall(_.compareTo(l) >= 0))
      case GreaterThan(c, v) => leaf(c, v)((_, mx, l) => mx.forall(_.compareTo(l) > 0))
      case GreaterThanOrEqual(c, v) => leaf(c, v)((_, mx, l) => mx.forall(_.compareTo(l) >= 0))
      case LessThan(c, v) => leaf(c, v)((mn, _, l) => mn.forall(_.compareTo(l) < 0))
      case LessThanOrEqual(c, v) => leaf(c, v)((mn, _, l) => mn.forall(_.compareTo(l) <= 0))
      case In(c, vs) => typeOf(c) match {
        case Some(dt) =>
          val ls = vs.toSeq.map(v => StatsCodec.literal(dt, v))
          (stats, _) => stats.get(c) match {
            case Some(cs) =>
              val mn = cs.min.flatMap(StatsCodec.toComparable(dt, _))
              val mx = cs.max.flatMap(StatsCodec.toComparable(dt, _))
              ls.exists(_.forall(l =>
                mn.forall(_.compareTo(l) <= 0) && mx.forall(_.compareTo(l) >= 0)))
            case None => true
          }
        case None => (_, _) => true
      }
      case IsNull(c) => (stats, _) => stats.get(c).forall(_.nullCount > 0)
      case IsNotNull(c) => (stats, rc) => stats.get(c).forall(_.nullCount < rc)
      case other => (stats, rc) => mightMatch(other, typeOf, stats, rc)
    }
  }

  /** Memoizing per-partition-tuple evaluator of [[partitionMatches]]: a
    * scan's files concentrate on few distinct partitions (10⁶ files over
    * ~10²-10³ partitions at 100 TB), so the predicate runs once per
    * DISTINCT tuple instead of once per file — the interpreted per-file
    * path measured 13.7 s on a 1M-file pruned plan. NOT thread-safe;
    * build one per planning call.
    */
  def partitionKeep(
      filters: Seq[Filter],
      partKeys: Seq[String],
      typeOf: String => Option[DataType]): Seq[String] => Boolean = {
    if (filters.isEmpty) return _ => true
    val cache = scala.collection.mutable.HashMap.empty[Seq[String], Boolean]
    pv => cache.getOrElseUpdate(pv,
      filters.forall(p => partitionMatches(p, partKeys, typeOf, pv)))
  }

  /** Can any row with these stats match the filter? */
  def mightMatch(
      f: Filter,
      typeOf: String => Option[DataType],
      stats: Map[String, ColStats],
      rowCount: Long): Boolean = {

    def range(col: String): Option[(Option[Comparable[Any]], Option[Comparable[Any]], Long)] =
      for { dt <- typeOf(col); cs <- stats.get(col) } yield
        (cs.min.flatMap(StatsCodec.toComparable(dt, _)),
         cs.max.flatMap(StatsCodec.toComparable(dt, _)),
         cs.nullCount)

    def lit(col: String, v: Any): Option[Comparable[Any]] =
      typeOf(col).flatMap(StatsCodec.literal(_, v))

    f match {
      case And(l, r) => mightMatch(l, typeOf, stats, rowCount) &&
        mightMatch(r, typeOf, stats, rowCount)
      case Or(l, r) => mightMatch(l, typeOf, stats, rowCount) ||
        mightMatch(r, typeOf, stats, rowCount)
      case Not(child) => mightNotMatchAll(child, typeOf, stats, rowCount)

      case EqualTo(c, v) =>
        (range(c), lit(c, v)) match {
          case (Some((mn, mx, _)), Some(l)) =>
            mn.forall(_.compareTo(l) <= 0) && mx.forall(_.compareTo(l) >= 0)
          case _ => true
        }
      case GreaterThan(c, v) =>
        (range(c), lit(c, v)) match {
          case (Some((_, mx, _)), Some(l)) => mx.forall(_.compareTo(l) > 0)
          case _ => true
        }
      case GreaterThanOrEqual(c, v) =>
        (range(c), lit(c, v)) match {
          case (Some((_, mx, _)), Some(l)) => mx.forall(_.compareTo(l) >= 0)
          case _ => true
        }
      case LessThan(c, v) =>
        (range(c), lit(c, v)) match {
          case (Some((mn, _, _)), Some(l)) => mn.forall(_.compareTo(l) < 0)
          case _ => true
        }
      case LessThanOrEqual(c, v) =>
        (range(c), lit(c, v)) match {
          case (Some((mn, _, _)), Some(l)) => mn.forall(_.compareTo(l) <= 0)
          case _ => true
        }
      case In(c, vs) =>
        range(c) match {
          case Some((mn, mx, _)) =>
            vs.exists { v =>
              lit(c, v).forall(l =>
                mn.forall(_.compareTo(l) <= 0) && mx.forall(_.compareTo(l) >= 0))
            }
          case _ => true
        }
      case IsNull(c) =>
        stats.get(c).forall(_.nullCount > 0)
      case IsNotNull(c) =>
        stats.get(c).forall(_.nullCount < rowCount)
      case StringStartsWith(c, prefix) =>
        // min/max string range can exclude a prefix: file matches only if
        // prefix is within [min.take(p), max.take(p)] lexicographically.
        stats.get(c) match {
          case Some(cs) =>
            val lo = cs.min.forall(_.take(prefix.length) <= prefix)
            val hi = cs.max.forall(_.take(prefix.length) >= prefix)
            lo && hi
          case None => true
        }
      case EqualNullSafe(c, v) =>
        if (v == null) stats.get(c).forall(_.nullCount > 0)
        else mightMatch(EqualTo(c, v), typeOf, stats, rowCount)
      case _ => true // unsupported filter → cannot prune
    }
  }

  /** For Not(child): can any row NOT match child? Conservative. */
  private def mightNotMatchAll(
      f: Filter,
      typeOf: String => Option[DataType],
      stats: Map[String, ColStats],
      rowCount: Long): Boolean = f match {
    case EqualTo(c, v) =>
      // all rows equal v only if min == max == v and no nulls
      val r = for { dt <- typeOf(c); cs <- stats.get(c); l <- StatsCodec.literal(dt, v) }
        yield {
          val allEq = (cs.min.flatMap(StatsCodec.toComparable(dt, _)),
            cs.max.flatMap(StatsCodec.toComparable(dt, _))) match {
            case (Some(mn), Some(mx)) =>
              mn.compareTo(l) == 0 && mx.compareTo(l) == 0 && cs.nullCount == 0
            case _ => false
          }
          !allEq
        }
      r.getOrElse(true)
    case _ => true
  }

  /** Evaluate a filter against exact partition values (strings, aligned with
    * partitionKeys). Only exact — a partition either matches or not.
    */
  def partitionMatches(
      f: Filter,
      partKeys: Seq[String],
      typeOf: String => Option[DataType],
      values: Seq[String]): Boolean = {
    val idx = partKeys.zipWithIndex.toMap
    def value(col: String): Option[Option[Comparable[Any]]] =
      idx.get(col).map { i =>
        val raw = values(i)
        if (raw == PartitionPathUtils.NullPartitionValue) None
        else typeOf(col).flatMap(StatsCodec.partitionComparable(_, raw))
      }
    def cmp(col: String, v: Any)(test: Int => Boolean): Boolean =
      (value(col), typeOf(col).flatMap(StatsCodec.literal(_, v))) match {
        case (Some(Some(pv)), Some(l)) => test(pv.compareTo(l))
        case (Some(None), _) => false // null partition value never compares
        case _ => true // not a partition col / un-comparable → don't prune
      }
    f match {
      case And(l, r) => partitionMatches(l, partKeys, typeOf, values) &&
        partitionMatches(r, partKeys, typeOf, values)
      case Or(l, r) => partitionMatches(l, partKeys, typeOf, values) ||
        partitionMatches(r, partKeys, typeOf, values)
      case Not(child) => !definitelyMatches(child, partKeys, typeOf, values)
      case EqualTo(c, v) => cmp(c, v)(_ == 0)
      case GreaterThan(c, v) => cmp(c, v)(_ > 0)
      case GreaterThanOrEqual(c, v) => cmp(c, v)(_ >= 0)
      case LessThan(c, v) => cmp(c, v)(_ < 0)
      case LessThanOrEqual(c, v) => cmp(c, v)(_ <= 0)
      case In(c, vs) => vs.exists(v => cmp(c, v)(_ == 0))
      case IsNull(c) =>
        value(c) match {
          case Some(pv) => pv.isEmpty
          case None => true
        }
      case IsNotNull(c) =>
        value(c) match {
          case Some(pv) => pv.nonEmpty
          case None => true
        }
      case StringStartsWith(c, p) =>
        idx.get(c) match {
          case Some(i) => values(i) != PartitionPathUtils.NullPartitionValue &&
            values(i).startsWith(p)
          case None => true
        }
      case _ => true
    }
  }

  /** Can a manifest shard whose partition tuples span [lo, hi] (in the
    * component-wise string ordering used when packing shards —
    * FileStore.PartTupleOrdering) contain a partition matching f?
    * Conservative: only equality/IN on partition keys skip, and a
    * component's bounds are used only when all earlier components are
    * pinned (classic composite-range rule). Range predicates and non-string
    * literal types fall through to file-level pruning.
    */
  def shardMightMatch(
      f: Filter,
      partKeys: Seq[String],
      lo: Seq[String],
      hi: Seq[String]): Boolean = {
    val idx = partKeys.zipWithIndex.toMap
    def litStr(v: Any): Option[String] = v match {
      case null => None
      case s: String => Some(s)
      case b: java.lang.Boolean => Some(b.toString)
      case n @ (_: java.lang.Integer | _: java.lang.Long |
                _: java.lang.Short | _: java.lang.Byte) => Some(n.toString)
      case _ => None
    }
    def inRange(colName: String, v: Any): Boolean = idx.get(colName) match {
      case None => true
      case Some(i) if i >= lo.length || i >= hi.length => true
      case Some(i) =>
        if ((0 until i).exists(j => lo(j) != hi(j))) true
        else litStr(v) match {
          case None => true
          case Some(s) =>
            val nullV = PartitionPathUtils.NullPartitionValue
            val loOk = lo(i) == nullV || lo(i) <= s
            val hiOk = hi(i) != nullV && s <= hi(i)
            loOk && hiOk
        }
    }
    f match {
      case And(l, r) => shardMightMatch(l, partKeys, lo, hi) &&
        shardMightMatch(r, partKeys, lo, hi)
      case Or(l, r) => shardMightMatch(l, partKeys, lo, hi) ||
        shardMightMatch(r, partKeys, lo, hi)
      case EqualTo(c, v) => inRange(c, v)
      case EqualNullSafe(c, v) if v != null => inRange(c, v)
      case In(c, vs) => vs.exists(v => inRange(c, v))
      case _ => true
    }
  }

  /** Do partition values definitely satisfy f? (used under Not) */
  private def definitelyMatches(
      f: Filter,
      partKeys: Seq[String],
      typeOf: String => Option[DataType],
      values: Seq[String]): Boolean = {
    val onlyPartCols = referencedCols(f).forall(partKeys.contains)
    onlyPartCols && partitionMatches(f, partKeys, typeOf, values)
  }

  def referencedCols(f: Filter): Seq[String] = f.references.toSeq
}

/** Hive-style partition path escaping (subset sufficient for our values). */
object PartitionPathUtils {
  val NullPartitionValue = "__HIVE_DEFAULT_PARTITION__"

  def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach { c =>
      if (needsEscaping(c)) sb.append(f"%%${c.toInt}%02X") else sb.append(c)
    }
    sb.toString
  }

  private def needsEscaping(c: Char): Boolean =
    c < 0x20 || "\"#%'*/:=?\\{[]^".contains(c)

  def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hex = s.substring(i + 1, i + 3)
        try { sb.append(Integer.parseInt(hex, 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
