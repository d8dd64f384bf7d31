package graft.spark.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Murmur3Hash}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The table's bucket assignment as a Spark V2 catalog function, so
  * Catalyst can REASON about our physical layout: a scan that reports
  * `KeyGroupedPartitioning(bucket(n, pk...))` lets two graft tables with
  * the same bucket spec join WITHOUT any shuffle (storage-partitioned
  * join), and `spark.sql.sources.v2.bucketing.shuffle.enabled` can
  * shuffle a foreign side BY THIS FUNCTION to co-locate it with stored
  * buckets. At 100 TB the eliminated exchange is the whole game.
  *
  * Must stay bit-identical to the write path's assignment
  * (`pmod(hash(pk...), n)` — GraftTable.scala:430), which it guarantees
  * by evaluating the same Murmur3(seed=42) Catalyst expression.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, cols...): graft fixed-bucket assignment, pmod(murmur3(cols), n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"bucket() takes (numBuckets, key...); got ${inputType.catalogString}")
    require(inputType.fields.head.dataType == IntegerType,
      s"bucket() first argument must be INT numBuckets; got ${inputType.fields.head.dataType}")
    new GraftBucketBound(inputType)
  }
}

class GraftBucketBound(inputType: StructType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = inputType.fields.map(_.dataType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false

  // same bits as functions.hash(...): Murmur3, seed 42, over the key
  // columns (input slot 0 is the numBuckets literal)
  @transient private lazy val hashExpr = new Murmur3Hash(
    inputType.fields.toSeq.zipWithIndex.drop(1).map { case (f, i) =>
      BoundReference(i, f.dataType, f.nullable)
    }, 42)

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val m = hashExpr.eval(input).asInstanceOf[Int] % n
    if (m < 0) m + n else m
  }
}
