package graft

import graft.core.{ColStats, Pruning, StatsCodec}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the file-skipping core: `Pruning.mightMatch == false`
  * must mean NO row in the file satisfies the filter (a false skip silently
  * drops rows — the worst failure mode a lakehouse scan can have). Random
  * row groups + random filter trees; stats built exactly like the write
  * path (StatsCodec.encode min/max + null count).
  */
class PruningPropertySpec extends AnyFunSuite {

  private val types: Map[String, DataType] =
    Map("a" -> LongType, "d" -> DoubleType, "s" -> StringType)

  private type Row = Map[String, Any] // null allowed as value

  private val genLong: Gen[Any] = Gen.frequency(
    (8, Gen.chooseNum(-20L, 20L).map(x => x: Any)), (2, Gen.const(null)))
  private val genDouble: Gen[Any] = Gen.frequency(
    (8, Gen.chooseNum(-5.0, 5.0).map(x => x: Any)), (2, Gen.const(null)))
  private val genString: Gen[Any] = Gen.frequency(
    (8, Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
      .map(_.mkString: Any))), (2, Gen.const(null)))

  private val genRow: Gen[Row] = for {
    a <- genLong; d <- genDouble; s <- genString
  } yield Map("a" -> a, "d" -> d, "s" -> s)

  private val genLeaf: Gen[Filter] = {
    val col = Gen.oneOf("a", "d", "s")
    def litFor(c: String): Gen[Any] = c match {
      case "a" => Gen.chooseNum(-22L, 22L).map(x => x: Any)
      case "d" => Gen.chooseNum(-6.0, 6.0).map(x => x: Any)
      case _ => Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString: Any))
    }
    Gen.oneOf(
      for { c <- col; v <- litFor(c) } yield EqualTo(c, v),
      for { c <- col; v <- litFor(c) } yield GreaterThan(c, v),
      for { c <- col; v <- litFor(c) } yield GreaterThanOrEqual(c, v),
      for { c <- col; v <- litFor(c) } yield LessThan(c, v),
      for { c <- col; v <- litFor(c) } yield LessThanOrEqual(c, v),
      for { c <- col; vs <- Gen.listOfN(3, litFor(c)) } yield In(c, vs.toArray),
      col.map(IsNull), col.map(IsNotNull),
      for { v <- litFor("s") } yield StringStartsWith("s", v.toString),
      for { c <- col; v <- litFor(c) } yield EqualNullSafe(c, v))
  }

  private def genFilter(depth: Int): Gen[Filter] =
    if (depth == 0) genLeaf
    else Gen.frequency(
      (4, genLeaf),
      (2, for { l <- genFilter(depth - 1); r <- genFilter(depth - 1) } yield And(l, r)),
      (2, for { l <- genFilter(depth - 1); r <- genFilter(depth - 1) } yield Or(l, r)),
      (1, genFilter(depth - 1).map(Not)))

  // ---- reference evaluation: SQL three-valued logic on one row ----
  private sealed trait TV
  private case object T extends TV
  private case object F extends TV
  private case object U extends TV

  private def cmp(c: String, v: Any, lit: Any): Option[Int] =
    if (v == null || lit == null) None
    else Some(((c, v, lit) match {
      case ("a", x: Long, l: Long) => x.compareTo(l)
      case ("d", x: Double, l: Double) => x.compareTo(l)
      case ("s", x: String, l: String) => x.compareTo(l)
      case other => throw new IllegalStateException(other.toString)
    }): Int)

  private def eval(f: Filter, row: Row): TV = f match {
    case And(l, r) => (eval(l, row), eval(r, row)) match {
      case (F, _) | (_, F) => F
      case (T, T) => T
      case _ => U
    }
    case Or(l, r) => (eval(l, row), eval(r, row)) match {
      case (T, _) | (_, T) => T
      case (F, F) => F
      case _ => U
    }
    case Not(c) => eval(c, row) match { case T => F; case F => T; case U => U }
    case EqualTo(c, v) => cmp(c, row(c), v).map(x => if (x == 0) T else F).getOrElse(U)
    case GreaterThan(c, v) => cmp(c, row(c), v).map(x => if (x > 0) T else F).getOrElse(U)
    case GreaterThanOrEqual(c, v) => cmp(c, row(c), v).map(x => if (x >= 0) T else F).getOrElse(U)
    case LessThan(c, v) => cmp(c, row(c), v).map(x => if (x < 0) T else F).getOrElse(U)
    case LessThanOrEqual(c, v) => cmp(c, row(c), v).map(x => if (x <= 0) T else F).getOrElse(U)
    case In(c, vs) =>
      val results = vs.toSeq.map(v => cmp(c, row(c), v))
      if (results.exists(_.contains(0))) T
      else if (results.forall(r => r.isDefined && !r.contains(0))) F else U
    case IsNull(c) => if (row(c) == null) T else F
    case IsNotNull(c) => if (row(c) != null) T else F
    case StringStartsWith(c, p) => row(c) match {
      case null => U
      case s: String => if (s.startsWith(p)) T else F
    }
    case EqualNullSafe(c, v) =>
      if (row(c) == null && v == null) T
      else if (row(c) == null || v == null) F
      else if (cmp(c, row(c), v).contains(0)) T else F
    case other => throw new IllegalStateException(s"unhandled $other")
  }

  /** Stats exactly as the write path stores them. */
  private def statsOf(rows: Seq[Row]): Map[String, ColStats] =
    types.map { case (c, dt) =>
      val vs = rows.map(_(c)).filter(_ != null)
      val sorted = vs.sortWith { (x, y) =>
        (x, y) match {
          case (a: Long, b: Long) => a < b
          case (a: Double, b: Double) => a < b
          case (a: String, b: String) => a < b
          case _ => false
        }
      }
      c -> ColStats(
        sorted.headOption.flatMap(v => StatsCodec.encode(dt, v)),
        sorted.lastOption.flatMap(v => StatsCodec.encode(dt, v)),
        rows.count(_(c) == null).toLong)
    }

  test("stats-based file skipping never skips a file containing a matching row") {
    val prop = Prop.forAll(
      Gen.nonEmptyListOf(genRow), genFilter(3)) { (rows, filter) =>
      val anyMatch = rows.exists(r => eval(filter, r) == T)
      val might = Pruning.mightMatch(filter, types.get, statsOf(rows), rows.size.toLong)
      // soundness: a real match must never be pruned away
      !anyMatch || might
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }

  test("compiled stats predicate is exactly the interpreted mightMatch") {
    // compileMight pre-resolves types + literals once per plan; any
    // divergence from the interpreter is a correctness bug (a stricter
    // compiled form would silently drop files)
    val prop = Prop.forAll(
      Gen.nonEmptyListOf(genRow), genFilter(3)) { (rows, filter) =>
      val st = statsOf(rows)
      val interpreted = Pruning.mightMatch(filter, types.get, st, rows.size.toLong)
      val compiled = Pruning.compileMight(filter, types.get)(st, rows.size.toLong)
      interpreted == compiled
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }

  test("pruning has teeth: clearly-disjoint ranges are actually skipped") {
    val rows = (1 to 10).map(i => Map[String, Any]("a" -> i.toLong, "d" -> i.toDouble, "s" -> "m"))
    val st = statsOf(rows)
    assert(!Pruning.mightMatch(EqualTo("a", 99L), types.get, st, 10))
    assert(!Pruning.mightMatch(GreaterThan("d", 50.0), types.get, st, 10))
    assert(!Pruning.mightMatch(StringStartsWith("s", "z"), types.get, st, 10))
    assert(!Pruning.mightMatch(IsNull("a"), types.get, st, 10))
  }
}
