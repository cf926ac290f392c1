package graft.urls

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.UrlExpressions.host_rev

/**
 * Domain-blocklist filtering — the URL-level quality gate every production
 * crawl/curation pipeline runs first (UT1/adult/spam domain lists, C4's and
 * RefinedWeb's blocked-domain step). The rule is SUBDOMAIN-AWARE, matching
 * how such lists are published: blocking `example.com` must also block
 * `a.b.example.com`, but NOT `notexample.com`. That suffix-with-label-
 * boundary match becomes a PREFIX match under [[UrlCanon.hostRev]]:
 *
 *   blocked(h, d)  ⇔  host_rev(h) == host_rev(d)
 *                   ∨ host_rev(h) startsWith host_rev(d) + "."
 *
 * Two shapes, by blocklist size:
 *  - [[blockedCol]]: the list folded into a row-local OR-chain of literal
 *    `startsWith` predicates — zero joins, codegen'd, the right plan for
 *    the usual few-hundred-entry curated list.
 *  - [[matchBlocked]]: the list as a broadcast DataFrame; the prefix
 *    predicate makes this a broadcast nested-loop join, which is still a
 *    single corpus scan × |list| cheap string-prefix tests per row —
 *    sound up to ~10^5 entries. (Beyond that the scale path is the
 *    standard registered-domain equi-join: extract the apex via a suffix
 *    list and hash-join — not implemented here because the sandbox has no
 *    public-suffix table; the trait-shaped seam is the `host_rev` key.)
 */
object Blocklist {

  /** host_rev of a driver-side domain string (for building literals). */
  private def revOf(domain: String): String = UrlCanon.hostRev(domain.toLowerCase)

  /** Boolean column: is `host` blocked by any of `domains` (subdomain-aware)?
    * Row-local OR-chain over literal prefixes — no join, no shuffle. */
  def blockedCol(host: Column, domains: Seq[String]): Column = {
    require(domains.nonEmpty, "empty blocklist")
    val hr = host_rev(lower(host))
    domains.map { d =>
      val r = revOf(d)
      (hr === lit(r)) || hr.startsWith(lit(r + "."))
    }.reduce(_ || _)
  }

  /** Join shape: rows of `df` whose `hostCol` is blocked, each paired with
    * the blocklist `domain` that matched (a host matching several entries
    * yields one row per match). `blockDf(domain: string)` is broadcast —
    * the prefix predicate runs as a broadcast nested-loop join: one corpus
    * scan, |list| prefix tests per row, no shuffle of the big side. */
  def matchBlocked(df: DataFrame, hostCol: Column, blockDf: DataFrame): DataFrame = {
    val b = broadcast(blockDf.select(col("domain"), host_rev(lower(col("domain"))).as("_brev")))
    val withRev = df.withColumn("_hrev", host_rev(lower(hostCol)))
    withRev.join(b,
        withRev("_hrev") === b("_brev") || withRev("_hrev").startsWith(concat(b("_brev"), lit("."))))
      .drop("_hrev", "_brev")
  }

  /** Filter shape: `df` with blocked rows removed (left-anti against the
    * broadcast list under the same subdomain-aware predicate). */
  def filterBlocked(df: DataFrame, hostCol: Column, blockDf: DataFrame): DataFrame = {
    val b = broadcast(blockDf.select(host_rev(lower(col("domain"))).as("_brev")))
    val withRev = df.withColumn("_hrev", host_rev(lower(hostCol)))
    withRev.join(b,
        withRev("_hrev") === b("_brev") || withRev("_hrev").startsWith(concat(b("_brev"), lit("."))),
        "left_anti")
      .drop("_hrev")
  }
}
