package graft.functions

import graft.model.RecordsTransformer
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{IntegerType, StringType}

/**
 * Example [[graft.model.RecordsTransformer]] — the pluggable
 * multi-record transformer the reference loads by class name
 * (ComplexTransformer SPI, `TransformerRegistry.java:41-108`),
 * spec-bound as `{"name": "custom",
 * "class": "graft.functions.NormalizeTextTransformer"}`.
 *
 * Deliberately `mapPartitions`-shaped (the one place per-partition
 * initialization — codec handles, dictionaries, model weights — can
 * live; a row expression can't hold state across records): normalizes
 * `text` (trim + ASCII lowercase) and appends a whitespace word count.
 * The work itself is trivial on purpose — the SPI plumbing (reflective
 * load, schema extension, per-partition iterator) is the product;
 * value-correctness is oracle-checked by `q37_custom_transform`.
 */
class NormalizeTextTransformer extends RecordsTransformer {

  override def transform(df: DataFrame): DataFrame = {
    val out = df.schema.add("norm_text", StringType).add("n_words", IntegerType)
    val enc = Encoders.row(out)
    val textIdx = df.schema.fieldIndex("text")
    df.mapPartitions { it =>
      // per-partition init goes here (the ComplexTransformer context
      // analog); this example needs none
      it.map { r =>
        val t = r.getString(textIdx)
        val norm = if (t == null) null else t.trim.toLowerCase(java.util.Locale.ROOT)
        val n: Integer = if (norm == null) null else norm.split("\\s+").length
        Row.fromSeq(r.toSeq :+ norm :+ n)
      }
    }(enc)
  }
}
