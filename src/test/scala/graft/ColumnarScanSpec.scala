package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Columnar DSv2 handoff: raw append scans pass the format reader's
  * ColumnarBatch straight to Catalyst's columnar pipeline (no per-row
  * flatten + UnsafeProjection); anything needing per-row work (merge, DVs,
  * evolution remaps, metadata columns) falls back to the row path.
  */
class ColumnarScanSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = java.nio.file.Files.createTempDirectory("graft-cs-wh").toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.gcs", classOf[graft.spark.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcs.db")
  }

  private def scanOf(df: DataFrame): BatchScanExec = {
    def find(p: SparkPlan): Option[BatchScanExec] = p match {
      case b: BatchScanExec => Some(b)
      case other => other.children.view.flatMap(find).headOption
    }
    find(df.queryExecution.executedPlan)
      .getOrElse(fail(s"no BatchScanExec in\n${df.queryExecution.executedPlan}"))
  }

  test("raw append scan reports COLUMNAR; results identical to source") {
    spark.sql(
      """CREATE TABLE gcs.db.li (
        | l_orderkey BIGINT, l_partkey BIGINT, l_quantity DOUBLE,
        | l_returnflag STRING) USING graft""".stripMargin)
    sf("lineitem").select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
      .createOrReplaceTempView("cs_src")
    spark.sql("INSERT INTO gcs.db.li SELECT * FROM cs_src")

    val scan = spark.table("gcs.db.li").select("l_orderkey", "l_quantity")
    assert(scanOf(scan).supportsColumnar,
      s"append scan must hand batches through:\n${scan.queryExecution.executedPlan}")
    // requested order differing from the read layout is a vector permutation
    val permuted = spark.table("gcs.db.li").select("l_quantity", "l_orderkey")
    assert(scanOf(permuted).supportsColumnar)

    val got = scan.agg(sum("l_quantity"), count("*")).collect().head
    val want = sf("lineitem").select($"l_quantity".cast("double"))
      .agg(sum("l_quantity"), count("*")).collect().head
    assert(got == want, s"$got vs $want")
    assert(permuted.collect().length == want.getLong(1))

    // filtered: predicate pushdown composes with the columnar handoff
    val filtered = spark.table("gcs.db.li")
      .filter($"l_returnflag" === "R").select("l_orderkey")
    assert(scanOf(filtered).supportsColumnar)
    assert(filtered.count() ==
      sf("lineitem").filter($"l_returnflag" === "R").count())
  }

  test("partitioned append table: partition-value vectors keep the scan columnar") {
    spark.sql(
      """CREATE TABLE gcs.db.lip (
        | l_orderkey BIGINT, l_quantity DOUBLE, l_returnflag STRING)
        |USING graft PARTITIONED BY (l_returnflag)""".stripMargin)
    spark.sql("INSERT INTO gcs.db.lip SELECT l_orderkey, l_quantity, l_returnflag FROM cs_src")
    val scan = spark.table("gcs.db.lip").filter($"l_returnflag" === "A")
    assert(scanOf(scan).supportsColumnar,
      s"partition constants are constant vectors:\n${scan.queryExecution.executedPlan}")
    val got = scan.agg(sum("l_quantity")).collect().head.getDouble(0)
    val want = sf("lineitem").filter($"l_returnflag" === "A")
      .agg(sum($"l_quantity".cast("double"))).collect().head.getDouble(0)
    assert(math.abs(got - want) < 1e-6, s"$got vs $want")
  }

  test("row-path fallbacks: MOR merge, DV mode, metadata columns, evolved schema") {
    // pk table (MOR) — merge is per-row work
    spark.sql(
      """CREATE TABLE gcs.db.pk (k BIGINT, v STRING) USING graft
        |TBLPROPERTIES ('primary-key' = 'k', 'bucket' = '2')""".stripMargin)
    spark.sql("INSERT INTO gcs.db.pk VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gcs.db.pk VALUES (2, 'b2')")
    assert(!scanOf(spark.table("gcs.db.pk")).supportsColumnar, "MOR stays row-based")
    assert(spark.table("gcs.db.pk").orderBy("k").collect()
      .map(_.getString(1)).toSeq == Seq("a", "b2"))

    // dv-mode pk table — kind-tombstone filter is per-row work
    spark.sql(
      """CREATE TABLE gcs.db.dv (k BIGINT, v STRING) USING graft
        |TBLPROPERTIES ('primary-key' = 'k', 'bucket' = '2',
        | 'deletion-vectors.enabled' = 'true')""".stripMargin)
    spark.sql("INSERT INTO gcs.db.dv VALUES (1, 'a'), (2, 'b')")
    assert(!scanOf(spark.table("gcs.db.dv")).supportsColumnar, "DV stays row-based")

    // metadata column — appended per row by the reader
    val withPath = spark.sql("SELECT l_orderkey, __file_path FROM gcs.db.li")
    assert(!scanOf(withPath).supportsColumnar, "__file_path stays row-based")
    assert(withPath.select("__file_path").distinct().count() >= 1)

    // schema evolution: pre-evolution files need the field-id remap align
    spark.sql("CREATE TABLE gcs.db.ev (id BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO gcs.db.ev VALUES (1, 'x')")
    spark.sql("ALTER TABLE gcs.db.ev RENAME COLUMN v TO w")
    spark.sql("ALTER TABLE gcs.db.ev ADD COLUMN extra INT")
    spark.sql("INSERT INTO gcs.db.ev VALUES (2, 'y', 7)")
    val evScan = spark.table("gcs.db.ev")
    assert(!scanOf(evScan).supportsColumnar, "pre-evolution files need the row align")
    assert(evScan.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "x"), (2L, "y")))
  }

  test("READ-OPTIMIZED pk table: fully-compacted scan goes columnar with full pushdown") {
    spark.sql(
      """CREATE TABLE gcs.db.ro (k BIGINT, grp STRING, v DOUBLE) USING graft
        |TBLPROPERTIES ('primary-key' = 'k', 'bucket' = '2',
        | 'write-only' = 'true')""".stripMargin)
    val t = graft.table.GraftTable.load(spark, wh + "/db/ro")
    t.upsert((0L until 500L).map(k => (k, s"g${k % 3}", k * 1.0)).toDF("k", "grp", "v"))
    t.upsert((0L until 100L).map(k => (k * 5, s"g${k % 3}", -1.0)).toDF("k", "grp", "v"))
    t.upsert((200L until 260L).map(k => (k, "gX", 0.0)).toDF("k", "grp", "v"))
    // pre-compaction: merge splits -> row path
    assert(!scanOf(spark.table("gcs.db.ro")).supportsColumnar)
    val want = spark.table("gcs.db.ro").orderBy("k").collect().toSeq
    t.compact()
    // post-compaction: every bucket is one max-level file -> columnar,
    // and VALUE predicates reach the file scan (no newer version exists)
    val ro = spark.table("gcs.db.ro")
    assert(scanOf(ro).supportsColumnar,
      s"fully-compacted pk scan must go columnar:\n${ro.queryExecution.executedPlan}")
    assert(ro.orderBy("k").collect().toSeq == want, "same rows as the merged read")
    val filtered = ro.filter($"v" < 0.0)
    assert(scanOf(filtered).supportsColumnar)
    assert(filtered.count() == want.count(_.getDouble(2) < 0.0))
    // a fresh L0 run flips the scan back to the merged row path
    t.upsert(Seq((3L, "gZ", 9.9)).toDF("k", "grp", "v"))
    val again = spark.table("gcs.db.ro")
    assert(!scanOf(again).supportsColumnar, "post-compaction churn must merge again")
    assert(again.filter($"k" === 3L).collect().head.getString(1) == "gZ")
  }

  test("NESTED schema pruning: the scan emits the pruned struct, values stay aligned") {
    spark.sql(
      """CREATE TABLE gcs.db.nested (id BIGINT,
        | person STRUCT<name: STRING, age: INT, vip: BOOLEAN>) USING graft
        |TBLPROPERTIES ('primary-key' = 'id', 'bucket' = '2',
        | 'write-only' = 'true')""".stripMargin)
    spark.sql("INSERT INTO gcs.db.nested VALUES " +
      "(1, named_struct('name', 'alice', 'age', 30, 'vip', CAST(NULL AS BOOLEAN)))," +
      "(2, named_struct('name', 'bob', 'age', 25, 'vip', true))")
    // select a child SUBSET: the scan's read schema must be the pruned
    // struct (not the full one with downstream ordinals mis-bound — the
    // silent-corruption shape where person.vip would read person.age)
    val pruned = spark.table("gcs.db.nested").select($"id", $"person.vip", $"person.name")
    val scanSchema = scanOf(pruned).schema
    val personType = scanSchema("person").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(personType.fieldNames.toSet == Set("vip", "name"),
      s"scan must emit the pruned struct, got ${personType.catalogString}")
    assert(pruned.orderBy("id").collect().map(r =>
      (r.getLong(0), Option(r.get(1)), r.getString(2))).toSeq ==
      Seq((1L, None, "alice"), (2L, Some(true), "bob")))

    // same through nested EVOLUTION: old-schema files remap to the pruned
    // target by child id
    spark.sql("ALTER TABLE gcs.db.nested RENAME COLUMN person.name TO nick")
    spark.sql("ALTER TABLE gcs.db.nested ADD COLUMN person.score DOUBLE")
    spark.sql("INSERT INTO gcs.db.nested VALUES " +
      "(3, named_struct('nick', 'carol', 'age', 41, 'vip', false, 'score', 9.5))")
    val evolved = spark.table("gcs.db.nested").select($"id", $"person.score", $"person.nick")
    assert(evolved.orderBy("id").collect().map(r =>
      (r.getLong(0), Option(r.get(1)), r.getString(2))).toSeq ==
      Seq((1L, None, "alice"), (2L, None, "bob"), (3L, Some(9.5), "carol")))
  }

  test("columnar scan composes with limit pushdown and column pruning") {
    assert(spark.table("gcs.db.li").select("l_orderkey").limit(5).collect().length == 5)
    val plan = scanOf(spark.table("gcs.db.li").select("l_orderkey"))
    assert(plan.schema.fieldNames.toSeq == Seq("l_orderkey"), "pruned to one column")
    assert(plan.supportsColumnar)
  }
}
