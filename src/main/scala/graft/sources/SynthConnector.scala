package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSource V2 connector skeleton — the demonstrated extension point
 * for the reference's connector-internal source family (SURVEY §2.2-5:
 * otsreader/hbasereader/cassandrareader/... full scans with
 * connector-planned range splits, `CollectionSplitUtil.java:40-129` /
 * `RangeSplitUtil.java:14-93`). No live store exists in this sandbox,
 * so the "store" is a deterministic synthetic event keyspace (the
 * reference's own streamreader is exactly such a source,
 * `StreamReader.java:96-231`); everything AROUND the rows is the real
 * connector surface a store-backed reader would use unchanged:
 *
 *   - **Partition planning** (`planInputPartitions`): the keyspace
 *     [0, nEvents) splits into `nSplits` contiguous lsn ranges — the
 *     connector-internal analog of the engine-side [[graft.operators
 *     .Split]] strategies, executed where DataX's `ReaderSplitUtil`
 *     runs (inside the reader plugin, invisible to the engine).
 *   - **Filter pushdown → PLANNING-TIME partition pruning**
 *     (`SupportsPushDownFilters`): `lsn` range conjuncts narrow the
 *     planned splits before any task launches (a tail read
 *     `lsn >= hwm` plans only the ranges past the high-watermark —
 *     the CDC resume shape at the connector level). All filters are
 *     also RETURNED as residuals, so boundary partitions stay
 *     row-exact: pruning is a strict optimization, never a semantics
 *     change.
 *   - **Column pruning** (`SupportsPushDownRequiredColumns`): the
 *     reader materializes ONLY requested fields — `select(doc_id)`
 *     never builds a token array (the expensive field), mirroring how
 *     a columnar store scan avoids untouched column families.
 *
 * Register by class name (`.format(classOf[SynthTableProvider].getName)`)
 * or the `graft-synth` short name (META-INF service registration).
 * Rows are a pure function of (seed, lsn) via a splitmix64 walk —
 * byte-identical across reads, splits, and cluster sizes
 * (spec-asserted), the same determinism rule as [[graft.gen
 * .ChangeLogGen]].
 */
class SynthTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthConnector.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(SynthConnector.Config.from(properties))
}

private[sources] class SynthTable(cfg: SynthConnector.Config)
    extends Table with SupportsRead {
  override def name(): String = s"graft-synth(${cfg.nEvents} events)"
  override def schema(): StructType = SynthConnector.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(cfg)
}

private[sources] class SynthScanBuilder(cfg: SynthConnector.Config)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var required: StructType = SynthConnector.Schema
  private var lsnLo = 0L
  private var lsnHi = Long.MaxValue // exclusive
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // lsn range conjuncts tighten the planned split set; EVERY filter
    // is returned as a residual (Spark re-applies it), so pruning can
    // only skip whole out-of-range partitions, never change rows
    filters.foreach {
      case GreaterThanOrEqual("lsn", v: Long) => lsnLo = math.max(lsnLo, v)
      case GreaterThan("lsn", v: Long) => lsnLo = math.max(lsnLo, v + 1)
      case LessThan("lsn", v: Long) => lsnHi = math.min(lsnHi, v)
      case LessThanOrEqual("lsn", v: Long) => lsnHi = math.min(lsnHi, v + 1)
      case EqualTo("lsn", v: Long) =>
        lsnLo = math.max(lsnLo, v); lsnHi = math.min(lsnHi, v + 1)
      case _ => ()
    }
    pushed = filters.filter {
      case GreaterThanOrEqual("lsn", _) | GreaterThan("lsn", _) |
           LessThan("lsn", _) | LessThanOrEqual("lsn", _) | EqualTo("lsn", _) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SynthScan(cfg, required, lsnLo, lsnHi)
}

private[sources] class SynthScan(cfg: SynthConnector.Config,
    required: StructType, lsnLo: Long, lsnHi: Long) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-synth splits=${cfg.nSplits} lsn=[$lsnLo,${math.min(lsnHi, cfg.nEvents)}) " +
      s"fields=${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val hi = math.min(lsnHi, cfg.nEvents)
    val per = math.max(1L, (cfg.nEvents + cfg.nSplits - 1) / cfg.nSplits)
    (0L until cfg.nSplits.toLong)
      .map(s => (s * per, math.min((s + 1) * per, cfg.nEvents)))
      .filter { case (lo, h) => h > lo && h > lsnLo && lo < hi } // planning-time prune
      .map { case (lo, h) => SynthPartition(cfg, lo, h): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)
}

private[sources] case class SynthPartition(cfg: SynthConnector.Config,
    lo: Long, hi: Long) extends InputPartition

private[sources] class SynthReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthPartition]
    new SynthReader(p.cfg, p.lo, p.hi, fields)
  }
}

private[sources] class SynthReader(cfg: SynthConnector.Config, lo: Long, hi: Long,
    fields: Array[String]) extends PartitionReader[InternalRow] {
  private var i = lo - 1
  override def next(): Boolean = { i += 1; i < hi }
  override def get(): InternalRow = {
    val vals = fields.map(f => SynthConnector.field(cfg, i, f))
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }
  override def close(): Unit = ()
}

object SynthConnector {

  val Schema: StructType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("shard", IntegerType, nullable = false),
    StructField("doc_id", StringType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("tokens", ArrayType(IntegerType, containsNull = false), nullable = false)))

  case class Config(nEvents: Long, nSplits: Int, seed: Long, nDocs: Long,
      avgTokens: Int, vocab: Int, nShards: Int)
  object Config {
    def from(m: util.Map[String, String]): Config = {
      def opt(k: String, d: String) = Option(m.get(k)).getOrElse(d)
      Config(opt("nEvents", "1000").toLong, opt("nSplits", "8").toInt,
        opt("seed", "42").toLong, opt("nDocs", "100").toLong,
        opt("avgTokens", "8").toInt, opt("vocab", "1000").toInt,
        opt("nShards", "4").toInt)
    }
  }

  /** splitmix64 — the standard 64-bit finalizer; every field below is a
    * pure function of (seed, lsn), the ChangeLogGen determinism rule. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def draw(cfg: Config, i: Long, salt: Long): Long =
    mix(mix(cfg.seed ^ (salt * 0x9e3779b97f4a7c15L)) ^ i)
  private def fm(x: Long, n: Long): Long = java.lang.Math.floorMod(x, n)

  def docIdx(cfg: Config, i: Long): Long = fm(draw(cfg, i, 1), cfg.nDocs)
  def opOf(cfg: Config, i: Long): String = {
    val d = fm(draw(cfg, i, 2), 100)
    if (d < 60) "I" else if (d < 90) "U" else "D"
  }
  def nTok(cfg: Config, i: Long): Int =
    (1 + fm(draw(cfg, i, 3), 2L * cfg.avgTokens)).toInt

  /** One field of row `i` as a Catalyst value — ONLY requested fields
    * are computed (the column-pruning payoff: `tokens` is the costly
    * one and is skipped entirely unless asked for). */
  def field(cfg: Config, i: Long, name: String): Any = name match {
    case "lsn" => i
    case "shard" => fm(docIdx(cfg, i), cfg.nShards).toInt
    case "doc_id" => UTF8String.fromString(f"doc${docIdx(cfg, i)}%012d")
    case "op" => UTF8String.fromString(opOf(cfg, i))
    case "n_tok" => nTok(cfg, i)
    case "tokens" =>
      val n = nTok(cfg, i)
      val a = new Array[Any](n)
      var j = 0
      while (j < n) { a(j) = fm(mix(draw(cfg, i, 4) ^ j), cfg.vocab).toInt; j += 1 }
      new GenericArrayData(a)
    case other => throw new IllegalArgumentException(s"unknown field $other")
  }
}
