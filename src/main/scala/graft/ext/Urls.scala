package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the FIRST dedup key of any web-crawl
  * pipeline (two fetches of the same page differ by case, default
  * ports, tracking params, fragments long before their content
  * differs). Everything here is a pure narrow map built from the
  * java.util.regex ∩ RE2 subset so the DuckDB oracle can apply the
  * identical chain.
  *
  * Canonical form: lowercase scheme and host, default port stripped
  * (:80 for http, :443 for https), fragment dropped, tracking
  * parameters removed (utm_*, gclid, fbclid, ref), remaining query
  * params sorted bytewise, empty path normalized to "/".
  */
object Urls {

  /** Tracking-parameter pattern (anchored at the param name). */
  val trackingParams = "^(utm_[^=]*|gclid|fbclid|ref)="

  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val path0 = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val q0 = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_join(array_sort(filter(split(q0, "&"),
      x => !(x.rlike(trackingParams) || (x === "")))), "&")
    concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** Naive apex domain: the last two host labels. (A faithful
    * registered-domain needs the public-suffix LIST — a data file, not
    * an algorithm — so e.g. `foo.co.uk` comes out as `co.uk` here;
    * documented limit, same honesty tier as the lang-id heuristic.) */
  def apexDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** Host of an (already canonicalized or raw) URL, lowercased, port
    * included if non-default. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))

  /** Per-domain crawl curation rollup: docs, distinct pages (canonical
    * URLs), refetch rate, and size stats per apex domain — the frame a
    * curation pipeline ranks/caps/blocklists domains from (domain-level
    * quotas are the standard counter to a single crawler-trap domain
    * flooding the corpus).
    *
    * Scale shape: canonicalization is a narrow per-row expression; ONE
    * map-side-combined groupBy on the domain carries the counts, the
    * exact distinct-page count (two-phase expand/agg), and a
    * decimal-folded char sum; output is domain-cardinality-bound. */
  def domainStats(df: DataFrame, urlCol: String, charsCol: String)
      : DataFrame = {
    val canon = canonicalize(col(urlCol))
    val host = regexp_replace(
      regexp_extract(canon, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
      ":\\d+$", "")
    df.select(apexDomain(host).as("domain"), canon.as("canonical"),
        col(charsCol).as("chars"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canonical")).as("n_pages"),
        sum(col("chars").cast("decimal(28,0)")).cast("long").as("sum_chars"))
      .select(col("domain"), col("n_docs"), col("n_pages"),
        round(lit(1.0) - col("n_pages").cast("double") /
          col("n_docs").cast("double"), 6).as("refetch_rate"),
        col("sum_chars"),
        round(col("sum_chars").cast("double") /
          col("n_docs").cast("double"), 6).as("mean_chars"))
  }

  /** URL-keyed dedup with a keep-BEST survivor — the crawl-side dedup
    * that runs before any content hashing: refetches of one page land
    * under one canonical URL, and the pipeline keeps the richest fetch
    * (highest `scoreCol`; CommonCrawl-style pipelines use length or a
    * quality score), not an arbitrary one. Ties break to the smallest
    * id, so the survivor is deterministic in any engine.
    *
    * REQUIRES a NUMERIC id column: the tie-break negates the id inside
    * the struct max (`-id`), which throws AnalysisException for string
    * ids. That negation is deliberate — it keeps the selection a
    * single map-side-combined aggregate (below); for non-numeric doc
    * ids use [[graft.ext.Dedup.dedupSurvivorsByPolicy]]'s window path
    * or pre-map the id to a numeric surrogate.
    *
    * Scale shape: ONE map-side-combined groupBy on the canonical URL
    * string carrying a (score, -id) struct max — no window, no sort,
    * no second pass; partial aggregation absorbs hot URLs (the same
    * keep-first min-struct idiom as CCNet line dedup). Page CONTENT
    * never enters the shuffle — only the id rides along. */
  def dedupByCanonicalUrl(df: DataFrame, idCol: String, urlCol: String,
      scoreCol: String): DataFrame =
    df.select(col(idCol).as("id"), canonicalize(col(urlCol)).as("canonical"),
      col(scoreCol).as("score"))
      .groupBy(col("canonical"))
      .agg(max(struct(col("score"), (-col("id")).as("ni"))).as("best"),
        count(lit(1)).as("n_copies"))
      .select(col("canonical"), (-col("best.ni")).as("keep_id"),
        col("best.score").as("best_score"), col("n_copies"))
}
