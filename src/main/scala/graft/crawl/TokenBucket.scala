package graft.crawl

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Per-host token-bucket politeness scheduler (SURVEY.md op 48) as a typed
 * `mapPartitions` — the one inherently stateful-sequential piece of the
 * round, hence the one place the engine drops out of Catalyst.
 *
 * Semantics: each host owns a bucket with capacity `burst` tokens refilling
 * at `ratePerSec`. Fetches consume one token; when the bucket is empty the
 * fetch is scheduled at the earliest virtual time a token exists. The clock
 * is VIRTUAL (starts at 0 per host per round) so the schedule is a pure
 * function of each candidate's rank within its host — never wall time.
 * Closed form: offset_ms(rank) = max(0, rank − burst) · ceil(1000/rate)
 * with 1-based rank (see [[offsetByRank]] — the per-step ceil matters for
 * non-integral 1000/rate), which the property suite asserts equals this
 * stateful implementation for random inputs (the stateful form is kept
 * because it generalizes to variable cost / per-host rates; the closed
 * form would not).
 *
 * Scale contract: callers repartition by host and sort within partitions by
 * (host, priority) first, so one host's candidates arrive consecutively in
 * one partition and per-partition state is a single live bucket at a time.
 */
object TokenBucket {

  final case class Bucket(burst: Int, ratePerSec: Double,
      fixedStepMs: Option[Long] = None) {
    private var tokens: Double = burst.toDouble
    private var vclockMs: Long = 0L

    /** Schedule the next fetch; returns its offset in virtual ms. */
    def next(): Long = {
      if (tokens >= 1.0) { tokens -= 1.0; vclockMs }
      else {
        // fixedStepMs: the integral per-step wait a robots Crawl-delay host
        // uses — bypassing the double division keeps the stateful schedule
        // bit-equal to the closed form ((1/(1000/step))*1000 rounds up to
        // step+1 for e.g. step=3000 under IEEE doubles)
        val waitMs = fixedStepMs.getOrElse(
          math.ceil((1.0 - tokens) / ratePerSec * 1000.0).toLong)
        vclockMs += waitMs
        tokens = 0.0 // the refilled token is consumed immediately
        vclockMs
      }
    }
  }

  /** The stateful bucket's schedule as a CLOSED-FORM column: once the burst
    * is consumed the bucket always refills from exactly 0 tokens, so every
    * subsequent fetch waits the same integral `ceil(1000/rate)` ms and
    *
    *   offset_ms(host_rank) = max(0, host_rank − burst) · ceil(1000/rate)
    *
    * (1-based host_rank) equals [[Bucket.next]]'s accumulation step for
    * step. Equivalence with [[schedule]] is property-asserted by CrawlSpec.
    *
    * This form is a pure per-row projection (codegen'd, no mapPartitions
    * boundary) and — the scale point — STATELESS: it needs no host
    * contiguity, so a Zipf-hot host's candidates can be salted across
    * partitions (op 47) while every row still receives its globally-correct
    * politeness offset. The stateful [[schedule]] remains the general
    * primitive (it extends to variable per-host rates / per-fetch costs,
    * where no closed form exists). */
  def offsetByRank(hostRank: org.apache.spark.sql.Column, burst: Int,
      ratePerSec: Double): org.apache.spark.sql.Column =
    greatest(lit(0L), (hostRank - burst).cast("long")) *
      lit(math.ceil(1000.0 / ratePerSec).toLong)

  /** Closed form for a host that declares a robots `Crawl-delay` (op 13×48):
    * a declared delay is a STRICTER politeness demand — it disables
    * bursting (spacing applies from the very first fetch) and the effective
    * spacing is max(delay, the client's own ceil(1000/rate) step), so a
    * permissive delay never raises the crawler above its configured rate.
    * Null `delayMs` (no directive) falls back to [[offsetByRank]]. Still a
    * pure stateless per-row projection — salting stays legal. */
  def offsetByRankDelay(hostRank: org.apache.spark.sql.Column, burst: Int,
      ratePerSec: Double, delayMs: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val step = lit(math.ceil(1000.0 / ratePerSec).toLong)
    when(delayMs.isNull, offsetByRank(hostRank, burst, ratePerSec))
      .otherwise((hostRank.cast("long") - 1L) * greatest(delayMs.cast("long"), step))
  }

  /** [[schedule]]'s closed form over a frame carrying `host_rank`: appends
    * `scheduled_offset_ms`. No layout requirement (see [[offsetByRank]]). */
  def scheduleByRank(cands: DataFrame, burst: Int, ratePerSec: Double): DataFrame =
    cands.withColumn("scheduled_offset_ms",
      offsetByRank(col("host_rank"), burst, ratePerSec))

  /** [[scheduleByRank]] honoring a per-host `crawl_delay_ms` column (null =
    * no directive). Appends `scheduled_offset_ms`. */
  def scheduleByRankDelay(cands: DataFrame, burst: Int, ratePerSec: Double): DataFrame =
    cands.withColumn("scheduled_offset_ms",
      offsetByRankDelay(col("host_rank"), burst, ratePerSec, col("crawl_delay_ms")))

  /** Candidates → Scheduled. Input MUST be host-clustered and host-sorted
    * within each partition (see class doc). */
  def schedule(cands: Dataset[Candidate], burst: Int, ratePerSec: Double): Dataset[Scheduled] =
    schedule(cands, burst, ratePerSec, _ => None)

  /** General stateful form with per-host robots Crawl-delay overrides (the
    * variable-per-host-rate generalization the class doc promises). A host
    * with a declared delay runs a burst-1 bucket at fixed integral step
    * max(delayMs, ceil(1000/rate)) — exactly [[offsetByRankDelay]]'s closed
    * form, which CrawlSpec property-asserts. */
  def schedule(cands: Dataset[Candidate], burst: Int, ratePerSec: Double,
      delayMsOf: String => Option[Long]): Dataset[Scheduled] = {
    import cands.sparkSession.implicits._
    val defaultStepMs = math.ceil(1000.0 / ratePerSec).toLong
    cands.mapPartitions { it =>
      var curHost: String = null
      var bucket: Bucket = null
      it.map { c =>
        if (c.host != curHost) {
          curHost = c.host
          bucket = delayMsOf(c.host) match {
            case Some(d) =>
              val eff = math.max(d, defaultStepMs)
              Bucket(1, 1000.0 / eff, fixedStepMs = Some(eff))
            case None => Bucket(burst, ratePerSec)
          }
        }
        Scheduled(c.canon_url, c.host, c.host_rev, c.depth, c.discovery_round,
          c.host_rank, bucket.next())
      }
    }
  }
}
