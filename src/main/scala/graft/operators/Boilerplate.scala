package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BOILERPLATE line removal — the C4/CCNet corpus-hygiene pass: a line
  * that recurs across a large fraction of one source's documents
  * (navigation chrome, cookie banners, promo headers, copyright footers)
  * is template, not content, and is stripped from every document of that
  * source before training.
  *
  * Semantics: a line is boilerplate in source S iff its normalized form
  * (`lower(trim(line))`) occurs in ≥ `minFracPct`% of S's documents
  * (distinct-doc frequency, so a line repeated within one document
  * counts once). A FRACTIONAL threshold is deliberate: absolute counts
  * drift with corpus scale, a fraction is scale-invariant.
  *
  * Scale shape: one explode of distinct normalized lines per doc feeds a
  * map-side-combined (source, line) doc-frequency count; the surviving
  * boilerplate SET is small BY CONSTRUCTION (a source with D docs and L
  * total distinct doc-line pairs has at most L/(D·frac) lines over the
  * threshold ≈ lines-per-doc/frac entries), so it collects to one array
  * per source and BROADCASTS — document cleaning is then a pure per-row
  * projection (`filter(lines, l -> !array_contains(bl, norm(l)))`): the
  * documents themselves never shuffle. Per-row cost is O(lines × |bl|)
  * linear scans; if a source's template set ever grows past the few
  * hundreds, swap the array probe for a map lookup or a line-level
  * anti-join — same semantics, one extra shuffle.
  */
object Boilerplate {

  /** `(idCol, sourceCol, n_lines, n_removed, clean_text)` per input doc. */
  def stripBoilerplate(
      df: DataFrame,
      textCol: String,
      idCol: String,
      sourceCol: String,
      minFracPct: Int = 30
  ): DataFrame = {
    require(minFracPct > 0 && minFracPct <= 100)
    val norm = (c: org.apache.spark.sql.Column) => lower(trim(c))
    val srcDocs = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val docLines = df.select(col(sourceCol).as("source"), col(idCol).as("id"),
        explode(array_distinct(transform(split(col(textCol), "\n"), norm))).as("line"))
    val boiler = docLines
      .groupBy("source", "line").agg(count(lit(1)).as("dfreq"))
      .join(srcDocs, "source")
      .filter(col("dfreq") * 100 >= col("n_docs") * minFracPct)
      .groupBy("source").agg(collect_list(col("line")).as("bl"))
      .withColumnRenamed("source", "__bl_source") // keep the caller's sourceCol unambiguous
    df.join(broadcast(boiler), df(sourceCol) === boiler("__bl_source"), "left")
      .withColumn("__ls", split(col(textCol), "\n"))
      .withColumn("__kept", filter(col("__ls"),
        l => !array_contains(coalesce(col("bl"), array().cast("array<string>")), norm(l))))
      .select(col(idCol), col(sourceCol),
        size(col("__ls")).as("n_lines"),
        (size(col("__ls")) - size(col("__kept"))).as("n_removed"),
        concat_ws("\n", col("__kept")).as("clean_text"))
  }
}
