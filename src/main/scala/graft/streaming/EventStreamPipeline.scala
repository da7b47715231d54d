package graft.streaming

import graft.operators.{Envelope, Replay}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.util.concurrent.ConcurrentHashMap
import scala.collection.concurrent.TrieMap

/** The reference service's streaming data path, re-expressed as Structured
  * Streaming (SURVEY.md §2.4, §3.1).
  *
  * Reference shape (reference/app/app.py:393-526): one async consumer per
  * stream reads a RabbitMQ stream from an offset spec, applies the
  * per-message pipeline (decode → fence → POISON → dispatch → enrich), and
  * pushes each record to one WebSocket. Engine shape: a streaming DataFrame
  * with envelope columns (`body`, `ordinal`, `ts_ms`, `routing_key`) flows
  * through the SAME column expressions as the batch path (graft.operators),
  * and a `foreachBatch` sink plays the socket. Micro-batches preserve
  * source order within a partition; a per-stream single partition gives the
  * reference's total order (T1).
  *
  * Control-plane parity:
  *   - single-active-consumer fencing (memcached in the reference,
  *     app.py:320-344) → [[StreamCoordinator]]: starting a consumer for a
  *     routing key stops the previous query — driver-side state, no
  *     per-message network round-trip (the reference's main throughput
  *     ceiling, BASELINE.md).
  *   - POISON (app.py:463-467): filtered from delivery AND flagged so the
  *     coordinator stops the query — in-band stop signal.
  *   - stats every N messages (app.py:93,515-518) → `observe()` metrics,
  *     surfaced through StreamingQueryProgress instead of a mutable dict.
  */
object EventStreamPipeline {

  /** Factory for an EXECUTOR-side frame sender (VERDICT r11 #8): `open()`
    * runs once per micro-batch ON THE EXECUTOR that owns the batch's
    * single partition, returning the per-record send function and a
    * closer. In production the factory opens a network connection to the
    * push endpoint (the socket lives where the data is — the driver never
    * touches the record stream); in the spec it appends to a shared
    * queue. Must be Serializable: the factory ships in the task closure.
    *
    * Delivery caveat: because sends happen inside the partition task, a
    * task retry / speculative attempt replays the partition and re-sends
    * frames delivered before the failure — at-least-once on retry (the
    * driver collect() path is at-most-once). See the executor-path note
    * in `run`.
    */
  trait SenderFactory extends Serializable {
    def open(): (String => Unit, () => Unit)
  }

  /** The enrichment/guard pipeline — identical expressions for a batch or
    * streaming DataFrame with columns (body STRING, ordinal LONG, ts_ms LONG).
    * Adds `forward` (empty/POISON/null guard verdict) and `wire` (the
    * enriched payload, null when not forwardable) without dropping rows, so
    * the sink can still observe POISON as the in-band stop signal.
    */
  def enrich(df: DataFrame): DataFrame =
    df.withColumn("forward",
        Envelope.forwardable(col("body")) &&
        // P3 drop-malformed: a '{'-dispatched body that does not parse is
        // skipped, not forwarded as a corrupted splice (app.py:473-485)
        (!Envelope.isJson(col("body")) || Envelope.isValidJson(col("body"))))
      .withColumn("wire",
        when(col("forward"),
          when(Envelope.isJson(col("body")),
            Envelope.enrichJson(col("body"), col("ordinal"), col("ts_ms")))
          .otherwise(
            Envelope.enrichProtoText(col("body"), col("ordinal"), col("ts_ms")))))

  /** Replay predicate (S2-S5) applied to the stream — the batch-expressible
    * twin of `startingOffsets`. Next passes through and therefore REQUIRES
    * a head-positioned source: the graft-log source DEFAULTS to
    * `startingOffsets=earliest`, so a Next consumer over a default-built
    * source would replay the whole retention archive —
    * [[graft.operators.Replay.logStream]] is the canonical wiring that
    * maps the spec to source options (code-review r17; spec-pinned in
    * GraftLogSourceSpec). Ordinal/timestamp specs are in-plan filters,
    * correct on any source position.
    */
  def seek(df: DataFrame, spec: Replay.OffsetSpec): DataFrame =
    spec match {
      case Replay.Next => df // pass-through: see the head-position contract above
      case other =>
        // a POISON whose offset metadata is missing must reach the sink
        // even through a seek filter — a null ordinal/ts fails any range
        // predicate, and the pill carries the stop signal regardless of
        // broker metadata (app.py:463-467; code-review r17). A pill WITH
        // a position below the seek point is correctly excluded: the
        // reference's broker never delivers below the requested offset.
        df.filter(
          Replay.seekPredicate(other, col("ordinal"), col("ts_ms")) ||
          (col("ordinal").isNull && col("body") === lit(Envelope.Poison)))
    }

  /** Wire a streaming envelope DataFrame to a push sink with POISON stop
    * semantics. `send` plays `websocket.send_text` (app.py:496-508).
    * Returns the started query.
    *
    * Delivery contract (T1): at-most-once to the sink, in source order per
    * micro-batch partition — matching the reference (no ack/resend).
    */
  def start(
      spark: SparkSession,
      source: DataFrame,
      routingKey: String,
      spec: Replay.OffsetSpec,
      coordinator: StreamCoordinator,
      send: String => Unit,
      checkpointDir: Option[String] = None,
      // Some(factory) switches the sink to the EXECUTOR-side send path:
      // one exchange to a single partition + in-partition ordinal sort +
      // foreachPartition sender, instead of the per-batch driver collect.
      // Default stays the driver path — faithful to the reference's one
      // driver-owned socket per stream; the executor path is the
      // hot-stream escape hatch (a single stream at 100× ingest is
      // driver-bound on the collect). `send` is unused when set.
      executorSender: Option[SenderFactory] = None): StreamingQuery = {

    // received/sent counters (reference stats dict, app.py:425-426,499-501;
    // emitted every 800 msgs there) — here observe() metrics surfaced per
    // micro-batch through StreamingQueryProgress.observedMetrics("ess_stats").
    // NOTE the metric semantics: `sent` counts FORWARDABLE rows in the
    // batch (a declarative pre-sink aggregate); in a batch truncated by
    // POISON the sink delivers fewer. Per-delivery counting — the
    // reference's exact semantics — is StreamingAggs.statsEveryN's job.
    val pipeline = enrich(seek(source, spec))
      .observe("ess_stats",
        count(lit(1)).as("received"),
        sum(when(col("forward"), 1L).otherwise(0L)).as("sent"))

    // Unique query name per consumer: the reference keys each consumer by
    // its own socket UUID (app.py:332-344), and the displaced predecessor is
    // still alive for a moment — two "es-<key>" queries may overlap briefly.
    val consumerId = java.util.UUID.randomUUID().toString.take(8)
    val queryName = s"es-$routingKey-$consumerId" // ONE definition: sink + reaper must agree
    // POISON is a query-lifetime latch, not a batch-local one: the stop is
    // asynchronous (reaper thread), so a micro-batch scheduled between the
    // POISON batch and the stop landing must deliver NOTHING — the
    // reference stops inline and never forwards past POISON.
    val poisonLatch = new java.util.concurrent.atomic.AtomicBoolean(false)
    // With a checkpoint, a restarted consumer resumes from the committed
    // source offsets — the durable twin of the reference's broker-side
    // replay (README.md:187-220); at-most-once to the socket becomes
    // effectively-once across restarts (no re-delivery of committed
    // batches). Without one, Spark uses an ephemeral checkpoint and a
    // restart replays per the offset spec.
    val writer0 = pipeline.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .queryName(queryName)
    // claim-start-attach runs under the coordinator's per-key lock so two
    // racing consumers for one key cannot invert the last-connect-wins
    // fencing (stop-old and insert-new are atomic per key)
    // executor-path POISON relay: the partition task cannot touch the
    // driver latch, so it counts POISON sightings in an accumulator and
    // the foreachBatch tail (driver side, after the action returns)
    // latches + requests the stop — same ORDERING guarantees as the
    // driver path (in-batch truncation at POISON, nothing delivered in
    // later batches), but NOT the same delivery guarantee under failure:
    // delivery happens inside the task, so a task retry or speculative
    // attempt on a real cluster replays the partition from its start and
    // RE-SENDS frames already delivered before the failure — at-least-
    // once on retry, where the driver path (send only after collect()
    // succeeds) stays at-most-once. Deploy the executor sender with
    // spark.speculation=false and spark.task.maxFailures=1 for this
    // query (or a dedup-by-ordinal receiver) when duplicate frames are
    // unacceptable.
    lazy val poisonAcc = spark.sparkContext.longAccumulator(s"poison-$queryName")
    coordinator.registerWith(routingKey) { () =>
      checkpointDir.fold(writer0)(
        dir => writer0.option("checkpointLocation", dir))
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (executorSender.isDefined) {
            if (!poisonLatch.get()) {
              val factory = executorSender.get
              val acc = poisonAcc
              // total order via ONE exchange to a single partition + an
              // in-partition sort — the executor-side twin of the driver
              // sort (per-stream delivery is serial either way; the win
              // is the record stream never crosses the driver). The body
              // itself never ships: only the POISON verdict does (the
              // exchange then carries a boolean + the wire string, not
              // 2× the payload — code-review r17). Null ordinals are
              // malformed → dropped, EXCEPT a POISON body: losing the
              // in-band stop signal to a missing broker offset would
              // keep the consumer alive past the pill; with no defined
              // position it sorts LAST (the batch's ordered records are
              // delivered, THEN delivery stops — the reference's
              // deliver-until-pill loop, app/app.py message loop, never
              // drops records that arrived before the pill; ADVICE r17).
              batch
                .select(
                  coalesce(col("body") === lit(Envelope.Poison), lit(false))
                    .as("is_poison"),
                  coalesce(col("forward"), lit(false)).as("forward"),
                  col("wire"), col("ordinal"))
                .filter(col("ordinal").isNotNull || col("is_poison"))
                .repartition(1)
                .sortWithinPartitions(
                  coalesce(col("ordinal"), lit(Long.MaxValue)))
                .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
                  val (sendFn, closeFn) = factory.open()
                  try {
                    var poisoned = false
                    while (!poisoned && it.hasNext) {
                      val r = it.next()
                      if (r.getBoolean(0)) {
                        poisoned = true; acc.add(1L)
                      } else if (r.getBoolean(1)) sendFn(r.getString(2))
                    }
                  } finally closeFn()
                }
              if (acc.value > 0L) {
                poisonLatch.set(true)
                coordinator.requestStop(routingKey, queryName, spark)
              }
            }
          } else if (!poisonLatch.get()) {
            // Per-stream delivery is inherently serial (one socket per
            // stream in the reference), so the tiny per-batch collect is
            // the faithful (and only) shape; parallelism lives ACROSS
            // streams, not within one. Sort driver-side: a DataFrame
            // orderBy would add a range-partition sampling pass that
            // executes the batch plan twice (double-firing the observe()
            // counters). Only the POISON verdict crosses the driver
            // boundary, never the body itself (body + wire ≈ 2× the
            // payload per row — code-review r17). Rows with a null
            // ordinal are malformed — dropped like the body guards drop
            // undecodable bodies — EXCEPT a POISON body: the in-band
            // stop signal must survive a missing broker offset
            // (app.py:463-467 checks the body on every message,
            // regardless of offset metadata); with no defined position
            // it sorts LAST, so the batch's ordered records deliver
            // before the stop (deliver-until-pill — ADVICE r17).
            val rows = batch
              .select(
                coalesce(col("body") === lit(Envelope.Poison), lit(false))
                  .as("is_poison"),
                coalesce(col("forward"), lit(false)).as("forward"),
                col("wire"), col("ordinal"))
              .collect()
              .filter(r => !r.isNullAt(3) || r.getBoolean(0))
              .sortBy(r => if (r.isNullAt(3)) Long.MaxValue else r.getLong(3))
            val it = rows.iterator
            while (!poisonLatch.get() && it.hasNext) {
              val r = it.next()
              if (r.getBoolean(0)) poisonLatch.set(true) // stop; do not forward (app.py:463-467)
              else if (r.getBoolean(1)) send(r.getString(2))
            }
            if (poisonLatch.get()) coordinator.requestStop(routingKey, queryName, spark)
          }
          ()
        }
        .start()
    }
  }
}

/** Driver-side single-active-consumer fencing: the memcached lock analog
  * (reference/app/app.py:320-344, 445-462). One StreamingQuery per routing
  * key; a new consumer displaces the old one (stop, not error), and stream
  * deletion stops the consumer — the DELETE /event-stream/{id} ordering
  * (app.py:684-715).
  *
  * Non-final as a test seam: ServiceShellSpec subclasses it to inject a
  * throwing `release` (the TimeoutException a slow q.stop() can raise) and
  * prove the shell's teardown paths survive it.
  */
class StreamCoordinator {
  private val active = new ConcurrentHashMap[String, StreamingQuery]()
  // the taken.poison marker of the reference's probes (probes/liveness.sh):
  // flips once when any consumer takes POISON and never resets — the
  // reference pod is meant to die after the pill (the AS inserts it only
  // after deleting the stream record, app/app.py:203-209). Served by the
  // shell's /health endpoints.
  private val poisonObserved = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** True once any consumer on this coordinator has taken POISON. */
  def poisonTaken: Boolean = poisonObserved.get

  /** Register a new consumer, stopping any prior holder of the key. */
  /** Fence-start-attach under the per-key lock (ConcurrentHashMap.compute
    * serializes per key): the previous holder is stopped, THEN the new
    * query starts, THEN it becomes the holder — all atomically per key, so
    * two racing connects cannot leave the older consumer holding the key
    * (the reference's last-connect-wins memcached fencing,
    * app.py:320-344). If the new query died before attach completed (a
    * POISON in its very first batch can beat the map insertion), the stale
    * entry is removed immediately after.
    */
  def registerWith(routingKey: String)(startQ: () => StreamingQuery): StreamingQuery = {
    var started: StreamingQuery = null
    active.compute(routingKey, (_, prev) => {
      // guarded like every other stop site (code-review r17): a throwing
      // prev.stop() — e.g. TimeoutException under
      // spark.sql.streaming.stopTimeout — must not abort the NEW
      // consumer's registration; the displaced query is on its way out
      // either way, and an unguarded throw here would leave IT the key
      // holder, inverting last-connect-wins fencing. NOTE stop() blocks
      // while holding this key's map bin: deployments where a sink write
      // can wedge should bound displacement with stopTimeout.
      if (prev != null && prev.isActive) {
        // InterruptedException restores the flag (ADVICE r17) — the
        // registration itself still proceeds, matching poisonAll's
        // latch-and-re-raise discipline for the same hazard.
        try prev.stop() catch {
          case _: InterruptedException => Thread.currentThread().interrupt()
          case _: Exception            => ()
        }
      }
      started = startQ()
      started
    })
    if (!started.isActive) active.remove(routingKey, started)
    started
  }

  def activeQuery(routingKey: String): Option[StreamingQuery] =
    Option(active.get(routingKey)).filter(_.isActive)

  /** Graceful-shutdown fan-out — the engine-side analog of the reference's
    * pre-stop hook (reference/hooks/pre-stop-hook.sh:8: kubelet touches
    * `given.poison` on termination, and the lifecycle ends with every
    * consumer taking POISON and the probes failing). Here the shell calls
    * this when told to stop: every active consumer is stopped (the in-band
    * pill's effect, applied to all keys at once) and the poison-taken flag
    * latches so both health probes flip to 503 exactly as if each consumer had
    * read POISON from its stream (probes/liveness.sh:4-8). Safe to call
    * from an admin/shutdown thread: no foreachBatch self-deadlock applies
    * (that hazard is only for stop() from inside the query's own sink).
    */
  def poisonAll(): Unit = {
    poisonObserved.set(true)
    // A lost interrupt on a JVM shutdown-hook thread delays termination,
    // so the flag must reach the hook's caller (ADVICE r15) — but
    // restoring it INSIDE the loop would make every subsequent q.stop()
    // (which awaits termination internally) throw InterruptedException
    // immediately, weakening the stop attempt for the remaining consumers
    // (ADVICE r16). Latch locally; re-raise once after the drain.
    var interrupted = false
    val it = active.entrySet().iterator()
    while (it.hasNext) {
      val q = it.next().getValue
      it.remove()
      // StreamingQuery.stop can throw (e.g. TimeoutException under
      // spark.sql.streaming.stopTimeout); one failing consumer must not
      // abort the drain — the remaining consumers still get stopped and
      // the caller (preStop) still closes every socket (ADVICE r14). The
      // pod is terminating either way: the grace-period kill is the
      // backstop for a query that refuses to stop, as in the reference.
      if (q.isActive) {
        try q.stop()
        catch {
          case _: InterruptedException => interrupted = true
          case _: Exception            => ()
        }
      }
    }
    if (interrupted) Thread.currentThread().interrupt()
  }

  /** Stop and deregister (stream deleted / POISON observed). */
  def release(routingKey: String): Unit = {
    val q = active.remove(routingKey)
    if (q != null && q.isActive) q.stop()
  }

  /** Identity-scoped release: stop `q` and deregister it ONLY if it still
    * holds the key. The unscoped [[release]] is for stream deletion (kill
    * whatever holds the key); this one is for a consumer tearing down its
    * OWN query (e.g. its socket hit EOF) — if last-connect-wins fencing has
    * already displaced it, the replacement's live query must survive the
    * stale consumer's teardown (same race [[requestStop]] scopes by name).
    */
  def release(routingKey: String, q: StreamingQuery): Unit = {
    active.remove(routingKey, q)
    if (q.isActive) q.stop()
  }

  /** Stop requested from inside the query's own foreachBatch (POISON): a
    * synchronous stop() there would self-deadlock waiting for the running
    * batch, so hand it to a reaper thread — the analog of the reference's
    * `consumer.stop()` letting `run()` unwind (app.py:520-524, 578-590).
    *
    * Scoped to the REQUESTING query (by its unique name): if a replacement
    * consumer has already displaced the poisoned one by the time the reaper
    * fires, the replacement must not be killed — only the query that
    * actually read POISON stops, and it is deregistered only if it still
    * holds the key.
    */
  def requestStop(routingKey: String, queryName: String,
                  spark: SparkSession): Unit = {
    // requestStop's only caller is the POISON path in the foreachBatch
    // sink — reaching here IS "poison taken" (the file-touch analog)
    poisonObserved.set(true)
    val t = new Thread(() => {
      val holder = active.get(routingKey)
      if (holder != null && holder.name == queryName) active.remove(routingKey, holder)
      spark.streams.active.filter(_.name == queryName)
        .foreach { q =>
          // guarded like poisonAll (code-review r17): a throwing stop
          // must not kill the reaper thread mid-drain — the post-POISON
          // lifecycle ends in the pod's grace-period kill, which
          // backstops a query that refuses to stop, and the latch
          // already guarantees nothing more is delivered
          if (q.isActive) {
            try q.stop() catch {
              case _: InterruptedException => Thread.currentThread().interrupt()
              case _: Exception            => ()
            }
          }
        }
    }, s"es-stop-$routingKey")
    t.setDaemon(true)
    t.start()
  }
}

/** The event-stream registry: the SQLite `es` table + REST control plane
  * analog (reference/app/app.py:119-139, 596-717). Pure driver-side
  * catalog state — creating/deleting streams runs no Spark job.
  */
final class EventStreamRegistry(secure: Boolean = false, host: String = "localhost") {
  /** The reference reads its VERSION file (app.py:100-101); ours. */
  private val BuildVersion = "4.0.0"

  final case class EsRecord(id: Long, uuid: String, routingKey: String) {
    def location: String =
      s"${if (secure) "wss" else "ws"}://$host/event-stream/$uuid"
  }

  /** GET /event-stream/version/ response (reference/app/app.py:596-604:
    * protocol enumeration, service name, version).
    */
  final case class EsVersion(protocol: String, name: String, version: String)

  /** GET /event-stream/version/ — the reference answers ("WEBSOCKET",
    * "Python FastAPI", VERSION-file contents); this engine is a streaming
    * DataFrame surface, so the protocol enumeration says so.
    */
  def version(): EsVersion =
    EsVersion(protocol = "DATAFRAME_STREAM", name = "Spark graft engine",
      version = BuildVersion)

  private val byId = TrieMap.empty[Long, EsRecord]
  private val nextId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** POST /event-stream/ — returns (id, location) (app.py:606-649). */
  def create(routingKey: String): EsRecord = {
    val rec = EsRecord(nextId.incrementAndGet(), shortUuid(), routingKey)
    byId.put(rec.id, rec)
    rec
  }

  /** GET /event-stream/ (app.py:652-674). */
  def list(): Seq[EsRecord] = byId.values.toSeq.sortBy(_.id)

  /** Lookup by uuid — the WS connect path (app.py:282-291). */
  def byUuid(uuid: String): Option[EsRecord] = byId.values.find(_.uuid == uuid)

  /** DELETE /event-stream/{id} — fence first, then registry row
    * (app.py:684-715); caller routes the fence through the coordinator.
    */
  def delete(id: Long, coordinator: StreamCoordinator): Boolean =
    byId.get(id) match {
      case Some(rec) =>
        // fence FIRST, then the registry row (the reference's DELETE
        // ordering, app.py:684-715): no window where the stream is
        // unlisted but its consumer still delivers, and a crash between
        // the two steps leaves a listed stream (retryable), never an
        // orphaned live query
        coordinator.release(rec.routingKey)
        byId.remove(id).isDefined
      case None => false
    }

  /** shortuuid analog (app.py:619): 22-char base62 of a random UUID. */
  private def shortUuid(): String = {
    val u = java.util.UUID.randomUUID()
    val chars = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    var bits = BigInt(u.getMostSignificantBits) << 64 | (BigInt(u.getLeastSignificantBits) & BigInt("FFFFFFFFFFFFFFFF", 16))
    if (bits < 0) bits = -bits
    val sb = new StringBuilder
    while (sb.length < 22) { sb.append(chars((bits % 62).toInt)); bits /= 62 }
    sb.toString
  }
}
