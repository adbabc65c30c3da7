package graft.crawl

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import graft.functions.{gf => _}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/**
 * Approximate URL-seen prefilter (SURVEY.md §2.8 U4, §4 O5).
 *
 * The reference dedups with an exact in-driver list probe
 * (/root/reference/weibo.py:177,1698-1699) — O(n) per item and bounded by one
 * process's memory. At 10^10 URLs the cheap membership test must be sharded
 * and approximate, with the AUTHORITATIVE answer still the exact anti-join
 * against the seen table: a bloom false positive only costs a lost re-crawl
 * candidate — never a duplicate fetch — and a false negative is impossible,
 * so the prefilter preserves the reference's first-occurrence-wins semantics
 * while cutting the anti-join's probe side by ~the seen-rate.
 *
 * Scale design: shard by pmod(url_hash, S). Each shard builds its own filter
 * via this TypedImperativeAggregate (partial aggregation happens map-side, so
 * the shuffle carries S serialized filters, not 10^10 longs). At cluster
 * scale S is sized so each blob stays a few hundred MB and shards are
 * broadcast (or persisted per-executor); in this sandbox S is small.
 */
case class BloomBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other); buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buffer.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomBuildAgg = copy(child = c.head)
  override def prettyName: String = "bloom_build"
}

/**
 * Sharded probe: `blobs` is a FOLDABLE array<binary> of S serialized filters
 * (shard = floorMod(hash, S)); filters are deserialized once per task and
 * cached, mirroring Spark's own BloomFilterMightContain trick, so the per-row
 * cost is one hash + one filter probe inside whole-stage codegen.
 */
case class BloomProbeSharded(blobs: Expression, hash: Expression)
  extends BinaryExpression {

  override def left: Expression = blobs
  override def right: Expression = hash
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  @transient private lazy val filters: Array[BloomFilter] = {
    val arr = blobs.eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      BloomFilter.readFrom(new ByteArrayInputStream(arr.getBinary(i)))
    }.toArray
  }

  def probe(h: Long): Boolean = {
    val fs = filters
    if (fs.isEmpty) false
    else fs(Math.floorMod(h, fs.length.toLong).toInt).mightContainLong(h)
  }

  override def eval(input: InternalRow): Any = {
    val h = hash.eval(input)
    if (h == null) false else probe(h.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomProbeSharded].getName)
    val h = hash.genCode(ctx)
    ev.copy(
      code = code"""
        ${h.code}
        boolean ${ev.value} = ${h.isNull} ? false : $ref.probe(${h.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomProbeSharded =
    copy(blobs = l, hash = r)
  override def prettyName: String = "bloom_probe"
}

object BloomSeen {
  /** Column API: build one filter per group. */
  def bloom_build(c: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    toColumn(BloomBuildAgg(toExpression(c), expectedItems, fpp)
      .toAggregateExpression())

  /** Column API: probe against collected shard blobs (index = floorMod(hash, S)). */
  def bloom_probe(shardBlobs: Seq[Array[Byte]], hashCol: Column): Column = {
    val lit = Literal.create(new GenericArrayData(shardBlobs.toArray[Any]),
      ArrayType(BinaryType, containsNull = false))
    toColumn(BloomProbeSharded(lit, toExpression(hashCol)))
  }
}
