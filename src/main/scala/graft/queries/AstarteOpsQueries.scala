package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's operator inventory (SURVEY §2) re-expressed over
  * the driver testdata. Each query exercises one operator's semantics
  * with the relational shape it has in the reference pipeline; names
  * carry the SURVEY §2 IDs.
  *
  * `events.ts` is epoch-nanos LONG on the Spark side (see Verify) and
  * TIMESTAMP in DuckDB — oracles convert via epoch_ms/epoch_us so both
  * engines compare exact integers, never doubles.
  */
/** Memoized per-(fixture, sfDir) ingested stores for the store-backed
  * queries: the operator those queries measure is the read side
  * (devices fold / object projection) — ingest throughput has its own
  * benchmark (Bench.ingestEps) — so a repeated run (min-of-2 timing,
  * re-verification) reuses the already-written fixture instead of
  * re-ingesting it.
  */
private[queries] object StoreFixtures {
  // LRU-bounded like every per-root control-plane memo: a process
  // cycling many fixture dirs (soaks, spec runs) must not pin one
  // store handle per dir forever; an evicted fixture rebuilds
  private val stores = new graft.core.BoundedMemo[
    (String, String), graft.storage.AstarteStore](64, "ops.fixtures")
  def cached(fixture: String, sfDir: String)(
      build: String => graft.storage.AstarteStore): graft.storage.AstarteStore =
    stores.getOrElseUpdate((fixture, sfDir))(
      build(java.nio.file.Files.createTempDirectory(s"graft-$fixture").toString))
}

object AstarteOpsQueries extends QueryPack {

  /** Inline volatile-trigger table (J6/J2): (trigger_id, event_type
    * scope, match operator, known value, target).
    */
  private def triggerTable(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("t1", "purchase", "GREATER_THAN", Some(150.0), "amqp://high-purchase"),
      ("t2", "error", "ANY", None, "amqp://errors"),
      ("t3", "click", "LESS_THAN", Some(20.0), "amqp://small-click"),
      ("t4", "purchase", "GREATER_THAN", Some(150.0), "amqp://audit"),
      ("t5", "signup", "CONTAINS", None, "amqp://signup")
    ).toDF("trigger_id", "on_type", "op", "known_value", "target")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S3: message-type router — dispatch on the type header; one
    // branch per type, here folded to per-type stats. At scale this is
    // a single pass, no shuffle beyond the final agg.
    "s3_route_msgtype" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_msgs"),
             round(sum(col("value")), 4).as("sum_value"))
    }),

    // S4: invalid-message discard — malformed messages routed to a
    // dead-letter side with a reason, never dropped silently.
    "s4_invalid_discard" -> ((s, d) => {
      val e = Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      e.filter(col("k").isNull || col("k") > 90 || col("value") < 1.0)
        .select(col("event_id"),
          when(col("k").isNull, "missing_key")
            .when(col("k") > 90, "key_out_of_range")
            .otherwise("value_too_small").as("reason"))
    }),

    // F2: capped zlib inflate as a Spark UDF round-trip over real
    // document text (wire form: 4-byte BE size + zlib body). DuckDB
    // has no zlib, but it doesn't need one: the oracle recomputes the
    // INFLATED bytes' length and md5 from the stored plaintext, so a
    // corrupted deflate/inflate cycle hash-mismatches — a full
    // three-way check, not rows-only. The codec itself is also
    // vector-tested in PayloadCodecSpec.
    "f2_zlib_roundtrip" -> ((s, d) => {
      import org.apache.spark.sql.functions.udf
      val deflate = udf((t: String) =>
        Option(t).map(graft.core.PayloadCodec.deflateProperties))
      val inflate = udf((b: Array[Byte]) =>
        Option(b).flatMap(bb => graft.core.PayloadCodec.safeInflate(bb.drop(4))))
      Tables.documents(s, d)
        .withColumn("back", inflate(deflate(col("text"))))
        .select(col("doc_id"),
          octet_length(col("back")).as("inflated_len"),
          md5(col("back")).as("inflated_md5"))
    }),

    // F3: introspection parse — "name:major:minor" strings validated
    // and split into typed columns.
    "f3_introspection_parse" -> ((s, d) => {
      val re = "^([a-z][a-z0-9]*):(\\d+):(\\d+)$"
      Tables.documents(s, d)
        .withColumn("intro",
          concat(col("source"), lit(":"), pmod(col("n_chars"), lit(5)),
                 lit(":"), pmod(col("doc_id"), lit(3))))
        .filter(col("intro").rlike(re))
        .select(col("doc_id"),
          regexp_extract(col("intro"), re, 1).as("iface"),
          regexp_extract(col("intro"), re, 2).cast("int").as("major"),
          regexp_extract(col("intro"), re, 3).cast("int").as("minor"))
    }),

    // F5+F6: path validation + token-wise template resolution with
    // %{param} wildcards (the automaton's semantics as a join).
    "f6_path_resolution" -> ((s, d) => {
      import s.implicits._
      val paths = Tables.events(s, d)
        .select(col("event_id"),
          concat(lit("/"), col("event_type"), lit("/"),
                 pmod(col("user_id"), lit(7))).as("path"))
      val templates = Seq("/purchase/%{i}", "/click/%{i}", "/error/3")
        .toDF("template")
      val pt = split(col("path"), "/")
      val tt = split(col("template"), "/")
      paths.join(broadcast(templates),
          size(pt) === size(tt) &&
          (element_at(tt, 2) === element_at(pt, 2) || element_at(tt, 2).startsWith("%{")) &&
          (element_at(tt, 3) === element_at(pt, 3) || element_at(tt, 3).startsWith("%{")))
        .select(col("event_id"), col("path"), col("template"))
    }),

    // F9: DB-friendly coercion — timestamp → epoch millis (exact
    // integer division on the nanos long, no float path).
    "f9_coercion" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), expr("ts div 1000000").as("ts_ms"),
          col("value").cast("string").as("value_str"))
    }),

    // F10: device-id codec — base64 of the natural key, and back.
    "f10_device_codec" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          base64(encode(col("c_name"), "UTF-8")).as("encoded"))
        .withColumn("decoded", decode(unbase64(col("encoded")), "UTF-8"))
    }),

    // F11: reception-timestamp normalization — decimicroseconds split
    // into (ms, submillis) exactly as the storage layer keeps them.
    "f11_ts_split" -> ((s, d) => {
      // decimicros derived from µs (×10): parquet ns below µs are not
      // representable on the DuckDB side, so both engines start from µs.
      Tables.events(s, d)
        .withColumn("decimicros", expr("(ts div 1000) * 10"))
        .select(col("event_id"),
          expr("decimicros div 10000").as("ts_ms"),
          expr("decimicros % 10000").as("submillis"))
    }),

    // J1: stream×registry equi-join — registry built per type
    // (threshold = avg value), broadcast back against the stream;
    // the reference's interface-metadata cache as a broadcast join.
    "j1_registry_lookup" -> ((s, d) => {
      val e = Tables.events(s, d)
      val registry = e.groupBy(col("event_type").as("reg_type"))
        .agg(avg(col("value")).as("threshold"))
      e.join(broadcast(registry), e("event_type") === registry("reg_type"))
        .filter(col("value") > col("threshold"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_above"))
    }),

    // J2: trigger match — equi-join on the scope key + residual
    // predicate per operator; congruent triggers (t1, t4) both fire.
    "j2_trigger_match" -> ((s, d) => {
      val e = Tables.events(s, d)
      val t = triggerTable(s)
      e.join(broadcast(t), e("event_type") === t("on_type"))
        .filter(
          (col("op") === "ANY") ||
          (col("op") === "GREATER_THAN" && col("value") > col("known_value")) ||
          (col("op") === "LESS_THAN" && col("value") < col("known_value")) ||
          (col("op") === "CONTAINS" && col("props").contains("7")))
        .select(col("event_id"), col("trigger_id"), col("target"))
    }),

    // J3: previous-value lookup (as-of) — the lazy fetch before
    // change-triggers: value_change fires only when prev != new.
    "j3_prev_value" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .filter(col("prev_value").isNotNull && col("prev_value") =!= col("value"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("prev_value"), 4).as("prev_value"),
          round(col("value"), 4).as("new_value"))
    }),

    // J3 general form: as-of join via graft.operators.AsOfJoin (one
    // shuffle, union + carry-forward — no range-join pair blowup).
    // Right side: per-type thresholds effective from each day start;
    // each event picks the latest threshold at or before its time.
    "j3_asof_join" -> ((s, d) => {
      // values have 2-decimal granularity → integer cents keep every
      // comparison and the emitted threshold exact across engines
      // (a daily avg lands exactly on rounding boundaries otherwise).
      val e = Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          expr("ts div 1000000").as("ts_ms"),
          round(col("value") * 100).cast("long").as("cents"))
      val thresholds = e
        .withColumn("rts", expr("ts_ms div 86400000") * 86400000L)
        .groupBy(col("event_type"), col("rts"))
        .agg(sum(col("cents")).as("s_cents"), count(lit(1)).as("n"))
      val joined = graft.operators.AsOfJoin.join(
        e, thresholds,
        keyCols = Seq("event_type"), leftTime = "ts_ms", rightTime = "rts",
        rightVals = Seq("s_cents", "n"))
      joined.select(col("event_id"), col("event_type"),
        expr("(asof_s_cents * 100) div asof_n").as("threshold_bp"),
        (col("cents") * col("asof_n") > col("asof_s_cents")).as("above"))
    }),

    // Forward as-of: each event attached to the NEXT daily threshold
    // boundary at-or-after it (the "what rule will apply next"
    // lookup). Same union-trick single shuffle as the backward join,
    // window order flipped. Last-day events have no following boundary
    // → NULL carries (left-join semantics).
    "j3_asof_forward" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          expr("ts div 1000000").as("ts_ms"),
          round(col("value") * 100).cast("long").as("cents"))
      val thresholds = e
        .withColumn("rts", expr("ts_ms div 86400000") * 86400000L)
        .groupBy(col("event_type"), col("rts"))
        .agg(sum(col("cents")).as("s_cents"), count(lit(1)).as("n"))
      graft.operators.AsOfJoin.joinForward(
          e, thresholds,
          keyCols = Seq("event_type"), leftTime = "ts_ms", rightTime = "rts",
          rightVals = Seq("s_cents", "n"))
        .select(col("event_id"), col("event_type"),
          expr("(asof_s_cents * 100) div asof_n").as("threshold_bp"),
          (col("cents") * col("asof_n") > col("asof_s_cents")).as("above"))
    }),

    // Nearest as-of: the time-closest boundary either side, backward
    // winning ties — one shuffle computes both carries in a single
    // window pass and picks by integer distance. Emits the matched
    // boundary time and direction so the choice itself is checked.
    "j3_asof_nearest" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          expr("ts div 1000000").as("ts_ms"))
      val thresholds = e
        .withColumn("rts", expr("ts_ms div 86400000") * 86400000L)
        .groupBy(col("event_type"), col("rts"))
        .agg(sum(lit(1)).as("n"))
      graft.operators.AsOfJoin.joinNearest(
          e, thresholds,
          keyCols = Seq("event_type"), leftTime = "ts_ms", rightTime = "rts",
          rightVals = Seq("n"))
        .select(col("event_id"), col("event_type"),
          col("asof_n").as("near_n"), col("asof_time").as("near_rts"),
          col("asof_dir"))
    }),

    // J4: introspection diff — full-outer join of old vs new announced
    // sets, classified ins/del/eq/changed (the Myers diff's effect).
    "j4_introspection_diff" -> ((s, d) => {
      val e = Tables.events(s, d)
      val cutoffNs = 1705276800L * 1000000000L // 2024-01-15T00:00Z
      val old = e.filter(col("ts") < cutoffNs)
        .groupBy(col("user_id").as("o_user"), col("event_type").as("o_type"))
        .agg(count(lit(1)).as("o_n"))
      val neu = e.filter(col("ts") >= cutoffNs)
        .groupBy(col("user_id").as("n_user"), col("event_type").as("n_type"))
        .agg(count(lit(1)).as("n_n"))
      old.join(neu,
          old("o_user") === neu("n_user") && old("o_type") === neu("n_type"),
          "full_outer")
        .select(
          coalesce(col("o_user"), col("n_user")).as("user_id"),
          coalesce(col("o_type"), col("n_type")).as("event_type"),
          when(col("o_user").isNull, "added")
            .when(col("n_user").isNull, "removed")
            .when(col("o_n") =!= col("n_n"), "changed")
            .otherwise("unchanged").as("diff"))
    }),

    // J6 + congruence merge: persistent ∪ volatile triggers, congruent
    // predicates merged to one trigger with a sorted target list
    // (reference impl.ex:1550-1569).
    "j6_trigger_overlay" -> ((s, d) => {
      val t = triggerTable(s)
      t.groupBy(col("on_type"), col("op"), col("known_value"))
        .agg(concat_ws(",", sort_array(collect_list(col("target")))).as("targets"),
             count(lit(1)).as("n_merged"))
        .select(col("on_type"), col("op"),
          round(col("known_value"), 4).as("known_value"),
          col("targets"), col("n_merged"))
    }),

    // A1 with skew handling: two-stage salted aggregation. A hot key
    // (one device producing most traffic) would bottleneck a single
    // reducer; salting spreads stage 1 across 16 partials, stage 2
    // merges them. Result is identical to the direct groupBy — the
    // oracle is the unsalted form.
    "a1_salted_totals" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("pc"), sum(col("value")).as("ps"))
        .groupBy(col("event_type"))
        .agg(sum(col("pc")).as("n_msgs"),
          round(sum(col("ps")), 2).as("sum_value"))
    }),

    // A1/A2: device totals & per-interface exchanged stats — counters
    // over (device) and (device, interface); bytes = payload+topic
    // lengths, mirroring the reference's accounting.
    "a2_exchanged_stats" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_msgs"),
             sum(length(col("props")) + length(col("event_type"))).as("n_bytes"))
    }),

    // A5: property-path gather — the consumer-properties digest: per
    // device, sorted ';'-joined set of owned paths.
    "a5_collect_paths" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"))
        .distinct()
        .groupBy(col("user_id"))
        .agg(concat_ws(";", sort_array(collect_list(col("event_type")))).as("paths"),
             count(lit(1)).as("n_paths"))
    }),

    // W2: property unset — last-writer-wins state where a final
    // 'error' event deletes the key (MERGE ... WHEN MATCHED DELETE).
    "w2_unset_delete" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("event_type"),
          round(col("value"), 4).as("value"))
    }),

    // W5+R7: datastream path index with TTL — per path, last activity
    // + expiry at 2.5× retention; only still-valid paths survive the
    // read-back (the reference's SELECT TTL() check).
    "w5_path_ttl" -> ((s, d) => {
      val e = Tables.events(s, d)
      val retentionMs = 86400L * 1000L // 1 day
      val ttlMs = retentionMs * 2 + retentionMs / 2
      val maxTs = e.agg(max(expr("ts div 1000000")).as("m"))
      e.groupBy(col("user_id"), col("event_type"))
        .agg(max(expr("ts div 1000000")).as("last_seen_ms"))
        .withColumn("expiry_ms", col("last_seen_ms") + lit(ttlMs))
        .crossJoin(broadcast(maxTs))
        .filter(col("expiry_ms") > col("m"))
        .select(col("user_id"), col("event_type"),
          col("last_seen_ms"), col("expiry_ms"))
    }),

    // W5 unconditional upsert: the path index covers EVERY datastream
    // path — retention (here: only 'click' mappings have it) adds an
    // expiry; no-retention paths carry NULL expiry and never lapse.
    // Survivors: null-expiry paths + retained paths still inside TTL.
    "w5_paths_all" -> ((s, d) => {
      val e = Tables.events(s, d)
      val retentionMs = 86400L * 1000L // 1 day
      val ttlMs = retentionMs * 2 + retentionMs / 2
      val maxTs = e.agg(max(expr("ts div 1000000")).as("m"))
      e.groupBy(col("user_id"), col("event_type"))
        .agg(max(expr("ts div 1000000")).as("last_seen_ms"))
        .withColumn("expiry_ms",
          when(col("event_type") === "click", col("last_seen_ms") + lit(ttlMs)))
        .crossJoin(broadcast(maxTs))
        .filter(col("expiry_ms").isNull || col("expiry_ms") > col("m"))
        .select(col("user_id"), col("event_type"),
          col("last_seen_ms"), col("expiry_ms"))
    }),

    // A4: old-introspection reconstruction — when an interface is
    // removed or its major bumps, the engine remembers "name:major" ->
    // minor of the outgoing version (DeviceProcessor.handleIntrospection
    // removedOld). Relational form: versions present before the cutoff
    // whose major changed or that disappeared after it.
    "a4_old_introspection" -> ((s, d) => {
      val e = Tables.events(s, d)
      val cutoffNs = 1705276800L * 1000000000L // 2024-01-15T00:00Z
      val old = e.filter(col("ts") < cutoffNs)
        .groupBy(col("user_id"), col("event_type"))
        .agg(pmod(max(col("event_id")), lit(3)).as("o_major"),
          count(lit(1)).as("o_minor"))
      val neu = e.filter(col("ts") >= cutoffNs)
        .groupBy(col("user_id").as("n_user"), col("event_type").as("n_type"))
        .agg(pmod(max(col("event_id")), lit(3)).as("n_major"))
      old.join(neu,
          col("user_id") === col("n_user") && col("event_type") === col("n_type"),
          "left")
        .filter(col("n_major").isNull || col("n_major") =!= col("o_major"))
        .select(col("user_id"),
          concat(col("event_type"), lit(":"), col("o_major")).as("entry"),
          col("o_minor"))
    }),

    // F4: properties-list parse over the REAL wire form — the Spark
    // side deflates the ';'-joined list, re-inflates the capped wire
    // payload and parses entries filtered to the announced
    // introspection (PayloadCodec.parseDeviceProperties); the oracle
    // parses the original cleartext (zlib round-trip is identity), so
    // a hash match proves wire + parse semantics end-to-end.
    "f4_properties_parse" -> ((s, d) => {
      import org.apache.spark.sql.functions.udf
      val announced = Set("ifc0", "ifc1", "ifc2")
      val parse = udf((text: String) =>
        graft.core.PayloadCodec.parseDeviceProperties(
          graft.core.PayloadCodec.deflateProperties(text), announced)
          .map(_.toSeq.sorted).getOrElse(Seq.empty))
      Tables.documents(s, d)
        .withColumn("plist", concat(
          lit("ifc"), pmod(col("doc_id"), lit(5)), lit("/p"), pmod(col("doc_id"), lit(7)),
          lit(";"),
          lit("ifc"), pmod(col("n_chars"), lit(5)), lit("/q"), pmod(col("n_chars"), lit(7))))
        .select(col("doc_id"), explode(parse(col("plist"))).as("pe"))
        .select(col("doc_id"), col("pe._1").as("iface"), col("pe._2").as("path"))
    }),

    // W4 via the STORE: object-aggregation envelopes ingested through
    // the state machine land as deterministic JSON rows; objectTable
    // projects them into typed v_<leaf> columns from the registry
    // schema (the reference's one-column-per-endpoint object table).
    "w4_object_projection" -> ((s, d) => {
      import s.implicits._
      import graft.core._, graft.core.AstarteValueType._
      import graft.streaming._
      val obj = InterfaceDescriptor("com.bench.Obj", 1, 0,
        InterfaceType.Datastream, Ownership.Device, Aggregation.Object)
      val registry = Registry(
        Map(obj.name -> obj),
        Map(obj.name -> Seq(
          Mapping(obj.name, 1, "/s", AString),
          Mapping(obj.name, 1, "/d", ADouble))),
        Nil)
      val store = StoreFixtures.cached("w4", d) { root =>
        val st = new graft.storage.AstarteStore(root)
        val envs = Tables.events(s, d).filter(col("user_id") < 10).map { r =>
          Envelope("realm", s"device-${r.getAs[Long]("user_id")}", "data",
            obj.name, "/",
            Bson.encode(Seq("v" -> scala.collection.immutable.ListMap(
              "s" -> r.getAs[String]("event_type"),
              "d" -> r.getAs[Double]("value")))),
            r.getAs[Long]("ts") / 1000 * 10, "ip", r.getAs[Long]("event_id"))
        }
        st.applyEffects(DeviceStateMachine.processBatch(envs, registry), registry)
        st
      }
      store.objectTable(s, obj, registry.mappingsOf(obj.name))
        .select(col("device_id"),
          col("reception_timestamp"),
          col("reception_timestamp_submillis").as("submillis"),
          col("v_s"), round(col("v_d"), 4).as("v_d"))
        .withColumn("submillis", col("submillis").cast("long"))
    }),

    // R3+R4 via the STORE (not a raw-event proxy): ingest a
    // connect → introspection → data* → disconnect flow per device
    // through the real state machine into an AstarteStore, then read
    // the folded `devices` dimension back with devicesSnapshot — the
    // reference's one-row-per-device table (queries.ex:412-510).
    // Device subset (user_id < 20): the devices table is a point-read
    // surface; folding is per-device linear so the subset bounds cost
    // without changing semantics.
    "r3_device_row" -> ((s, d) => {
      import s.implicits._
      import graft.core._, graft.core.AstarteValueType._
      import graft.streaming._
      import graft.triggers._
      val ifaceName = "com.bench.EventStream"
      val registry = Registry(
        Map(ifaceName -> InterfaceDescriptor(ifaceName, 1, 0,
          InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)),
        Map(ifaceName -> Seq(Mapping(ifaceName, 1, "/%{type}/value", ADouble))),
        Nil)
      val store = StoreFixtures.cached("r3", d) { root =>
        val st = new graft.storage.AstarteStore(root)
        val events = Tables.events(s, d).filter(col("user_id") < 20)
        val data = events.map { r =>
          Envelope("realm", s"device-${r.getAs[Long]("user_id")}", "data",
            ifaceName, s"/${r.getAs[String]("event_type")}/value",
            Bson.encode(Seq("v" -> r.getAs[Double]("value"))),
            r.getAs[Long]("ts") / 1000 * 10, "10.0.0.1", r.getAs[Long]("event_id"))
        }
        val lifecycle = events.groupBy(col("user_id"))
          .agg(min(expr("ts div 1000 * 10")).as("lo"), max(expr("ts div 1000 * 10")).as("hi"))
          .as[(Long, Long, Long)]
          .flatMap { case (uid, lo, hi) =>
            val dev = s"device-$uid"
            Seq(
              Envelope("realm", dev, "connection", null, null,
                Array.emptyByteArray, lo - 10000, "10.0.0.1", -3L),
              Envelope("realm", dev, "introspection", null, null,
                s"$ifaceName:1:${uid % 4}".getBytes("UTF-8"), lo - 10000, "10.0.0.1", -2L),
              Envelope("realm", dev, "disconnection", null, null,
                Array.emptyByteArray, hi + 10000, "10.0.0.1", Long.MaxValue))
          }
        st.applyEffects(DeviceStateMachine.processBatch(data.union(lifecycle), registry))
        st
      }
      val renderMap = (c: String) => expr(
        s"concat_ws(',', transform(array_sort(map_entries($c)), x -> concat(x.key, '=', x.value)))")
      store.devicesSnapshot(s).toDF()
        .select(col("device_id"), col("connected"),
          col("last_connection"), col("last_disconnection"), col("last_seen_ip"),
          col("total_received_msgs"), col("total_received_bytes"),
          concat(renderMap("introspection"), lit("."), renderMap("introspection_minor"))
            .as("intro_render"),
          renderMap("exchanged_msgs_by_interface").as("exchanged_msgs"),
          renderMap("exchanged_bytes_by_interface").as("exchanged_bytes"))
    }),

    // R3/A2/A4 via the STORE, multi-interface: two interfaces split
    // the data stream, and a major bump (com.bench.Aux 1→2) announced
    // after the data records the retired version in old_introspection
    // — so per-(iface,major) exchanged maps AND the old-introspection
    // fold are oracle-checked through the real state machine + devices
    // fold (reference data_updater_test.exs:1110-1182).
    "r3_device_multi" -> ((s, d) => {
      import s.implicits._
      import graft.core._, graft.core.AstarteValueType._
      import graft.streaming._
      val ifaceA = "com.bench.EventStream"
      val ifaceB = "com.bench.Aux"
      val registry = Registry(
        Map(
          ifaceA -> InterfaceDescriptor(ifaceA, 1, 0,
            InterfaceType.Datastream, Ownership.Device, Aggregation.Individual),
          ifaceB -> InterfaceDescriptor(ifaceB, 1, 0,
            InterfaceType.Datastream, Ownership.Device, Aggregation.Individual)),
        Map(
          ifaceA -> Seq(Mapping(ifaceA, 1, "/%{type}/value", ADouble)),
          ifaceB -> Seq(Mapping(ifaceB, 1, "/%{type}/value", ADouble))),
        Nil)
      val store = StoreFixtures.cached("r3multi", d) { root =>
        val st = new graft.storage.AstarteStore(root)
        val events = Tables.events(s, d).filter(col("user_id") < 10)
        val data = events.map { r =>
          val iface = if (r.getAs[Long]("event_id") % 2 == 0) ifaceA else ifaceB
          Envelope("realm", s"device-${r.getAs[Long]("user_id")}", "data",
            iface, s"/${r.getAs[String]("event_type")}/value",
            Bson.encode(Seq("v" -> r.getAs[Double]("value"))),
            r.getAs[Long]("ts") / 1000 * 10, "10.0.0.1", r.getAs[Long]("event_id"))
        }
        val lifecycle = events.groupBy(col("user_id"))
          .agg(min(expr("ts div 1000 * 10")).as("lo"), max(expr("ts div 1000 * 10")).as("hi"))
          .as[(Long, Long, Long)]
          .flatMap { case (uid, lo, hi) =>
            val dev = s"device-$uid"
            Seq(
              Envelope("realm", dev, "connection", null, null,
                Array.emptyByteArray, lo - 20000, "10.0.0.1", -5L),
              Envelope("realm", dev, "introspection", null, null,
                s"$ifaceB:1:${uid % 3};$ifaceA:1:0".getBytes("UTF-8"),
                lo - 10000, "10.0.0.1", -4L),
              // major bump announced after all data: Aux:1 retires
              Envelope("realm", dev, "introspection", null, null,
                s"$ifaceB:2:${uid % 3};$ifaceA:1:0".getBytes("UTF-8"),
                hi + 10000, "10.0.0.1", Long.MaxValue - 1),
              Envelope("realm", dev, "disconnection", null, null,
                Array.emptyByteArray, hi + 20000, "10.0.0.1", Long.MaxValue))
          }
        st.applyEffects(DeviceStateMachine.processBatch(data.union(lifecycle), registry))
        st
      }
      val renderMap = (c: String) => expr(
        s"concat_ws(',', transform(array_sort(map_entries($c)), x -> concat(x.key, '=', x.value)))")
      store.devicesSnapshot(s).toDF()
        .select(col("device_id"), col("connected"),
          col("last_connection"), col("last_disconnection"),
          col("total_received_msgs"), col("total_received_bytes"),
          concat(renderMap("introspection"), lit("."), renderMap("introspection_minor"))
            .as("intro_render"),
          renderMap("old_introspection").as("old_render"),
          renderMap("exchanged_msgs_by_interface").as("exchanged_msgs"),
          renderMap("exchanged_bytes_by_interface").as("exchanged_bytes"))
    }),

    // W9/A3: introspection maps — per device, deterministic
    // "iface:count" map rendering (sorted entries).
    "w9_introspection_maps" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          concat(col("event_type"), lit(":"), col("n")).as("entry"))
        .groupBy(col("user_id"))
        .agg(concat_ws(",", sort_array(collect_list(col("entry")))).as("introspection"))
    }),

    // R6: kv_store blobAsInt — binary blob reinterpreted as integer
    // (here: leading 8 hex chars of a digest, exact in both engines).
    "r6_blob_as_int" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          conv(substring(md5(col("source")), 1, 8), 16, 10).cast("long")
            .as("blob_int"))
    }),

    // ST1-as-batch: per-device serialized processing → sessionization
    // with a 30-minute inactivity gap; per device: session count and
    // the largest session.
    "st_sessionize" -> ((s, d) => {
      val gapNs = 30L * 60 * 1000000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ws = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(ws))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("session_events"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
             max(col("session_events")).as("max_session_events"))
    }),

    // 2.7 operator surface as row-level Column predicates: the whole
    // scalar trigger language evaluated per message.
    "vm_truth_table" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_id") < 200)
        .select(col("event_id"),
          (col("value") > 100.0).as("gt"),
          (col("value") <= 100.0).as("lte"),
          (col("event_type") === "error").as("eq"),
          (col("event_type") =!= "error").as("neq"),
          col("event_type").contains("ick").as("str_contains"),
          array_contains(split(col("event_type"), "a"), "se").as("arr_contains"),
          lit(true).as("any"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "s3_route_msgtype" ->
      """SELECT event_type, count(*) AS n_msgs,
        |  round(sum(value), 4) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,
    "s4_invalid_discard" ->
      """SELECT event_id,
        |  CASE WHEN json_extract_string(props,'$.k') IS NULL THEN 'missing_key'
        |       WHEN json_extract_string(props,'$.k')::INT > 90 THEN 'key_out_of_range'
        |       ELSE 'value_too_small' END AS reason
        |FROM events
        |WHERE json_extract_string(props,'$.k') IS NULL
        |   OR json_extract_string(props,'$.k')::INT > 90 OR value < 1.0""".stripMargin,
    // the oracle recomputes what a CORRECT deflate→inflate cycle must
    // reproduce (byte length + md5 of the UTF-8 text) straight from
    // the stored plaintext — no zlib needed in DuckDB
    "f2_zlib_roundtrip" ->
      """SELECT doc_id, strlen(text) AS inflated_len,
        |  md5(text) AS inflated_md5 FROM documents""".stripMargin,
    "f3_introspection_parse" ->
      """WITH t AS (SELECT doc_id,
        |    source || ':' || (n_chars % 5) || ':' || (doc_id % 3) AS intro
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_extract(intro, '^([a-z][a-z0-9]*):(\d+):(\d+)$', 1) AS iface,
        |  regexp_extract(intro, '^([a-z][a-z0-9]*):(\d+):(\d+)$', 2)::INT AS major,
        |  regexp_extract(intro, '^([a-z][a-z0-9]*):(\d+):(\d+)$', 3)::INT AS minor
        |FROM t WHERE regexp_matches(intro, '^([a-z][a-z0-9]*):(\d+):(\d+)$')""".stripMargin,
    "f6_path_resolution" ->
      """WITH paths AS (
        |  SELECT event_id, '/' || event_type || '/' || (user_id % 7) AS path
        |  FROM events),
        |templates AS (SELECT unnest(['/purchase/%{i}','/click/%{i}','/error/3']) AS template)
        |SELECT event_id, path, template
        |FROM paths JOIN templates ON
        |  len(string_split(path,'/')) = len(string_split(template,'/'))
        |  AND (string_split(template,'/')[2] = string_split(path,'/')[2]
        |       OR starts_with(string_split(template,'/')[2], '%{'))
        |  AND (string_split(template,'/')[3] = string_split(path,'/')[3]
        |       OR starts_with(string_split(template,'/')[3], '%{'))""".stripMargin,
    "f9_coercion" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms, value::VARCHAR AS value_str
        |FROM events""".stripMargin,
    "f10_device_codec" ->
      """SELECT c_custkey, base64(c_name::BLOB) AS encoded,
        |  c_name AS decoded
        |FROM customer""".stripMargin,
    "f11_ts_split" ->
      """WITH t AS (SELECT event_id, epoch_us(ts) * 10 AS decimicros FROM events)
        |SELECT event_id, decimicros // 10000 AS ts_ms,
        |  decimicros % 10000 AS submillis
        |FROM t""".stripMargin,
    "j1_registry_lookup" ->
      """WITH registry AS (
        |  SELECT event_type AS reg_type, avg(value) AS threshold
        |  FROM events GROUP BY event_type)
        |SELECT event_type, count(*) AS n_above
        |FROM events JOIN registry ON event_type = reg_type
        |WHERE value > threshold GROUP BY event_type""".stripMargin,
    "j2_trigger_match" ->
      """WITH triggers(trigger_id, on_type, op, known_value, target) AS (VALUES
        |  ('t1','purchase','GREATER_THAN',150.0,'amqp://high-purchase'),
        |  ('t2','error','ANY',NULL,'amqp://errors'),
        |  ('t3','click','LESS_THAN',20.0,'amqp://small-click'),
        |  ('t4','purchase','GREATER_THAN',150.0,'amqp://audit'),
        |  ('t5','signup','CONTAINS',NULL,'amqp://signup'))
        |SELECT event_id, trigger_id, target
        |FROM events JOIN triggers ON event_type = on_type
        |WHERE op = 'ANY'
        |   OR (op = 'GREATER_THAN' AND value > known_value)
        |   OR (op = 'LESS_THAN' AND value < known_value)
        |   OR (op = 'CONTAINS' AND contains(props, '7'))""".stripMargin,
    "j3_prev_value" ->
      """SELECT event_id, user_id, event_type,
        |  round(prev_value, 4) AS prev_value, round(value, 4) AS new_value
        |FROM (SELECT *, lag(value) OVER (
        |    PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_value
        |  FROM events)
        |WHERE prev_value IS NOT NULL AND prev_value <> value""".stripMargin,
    "j3_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, event_type, epoch_ms(ts) AS ts_ms,
        |    round(value * 100)::BIGINT AS cents
        |  FROM events),
        |thresholds AS (
        |  SELECT event_type, (ts_ms // 86400000) * 86400000 AS rts,
        |    sum(cents) AS s_cents, count(*) AS n
        |  FROM e GROUP BY 1, 2)
        |SELECT e.event_id, e.event_type,
        |  ((t.s_cents * 100) // t.n)::BIGINT AS threshold_bp,
        |  e.cents * t.n > t.s_cents AS above
        |FROM e ASOF LEFT JOIN thresholds t
        |  ON e.event_type = t.event_type AND e.ts_ms >= t.rts""".stripMargin,
    "j3_asof_forward" ->
      """WITH e AS (
        |  SELECT event_id, event_type, epoch_ms(ts) AS ts_ms,
        |    round(value * 100)::BIGINT AS cents
        |  FROM events),
        |thresholds AS (
        |  SELECT event_type, (ts_ms // 86400000) * 86400000 AS rts,
        |    sum(cents) AS s_cents, count(*) AS n
        |  FROM e GROUP BY 1, 2)
        |SELECT e.event_id, e.event_type,
        |  ((t.s_cents * 100) // t.n)::BIGINT AS threshold_bp,
        |  e.cents * t.n > t.s_cents AS above
        |FROM e ASOF LEFT JOIN thresholds t
        |  ON e.event_type = t.event_type AND e.ts_ms <= t.rts""".stripMargin,
    "j3_asof_nearest" ->
      """WITH e AS (
        |  SELECT event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        |thresholds AS (
        |  SELECT event_type, (ts_ms // 86400000) * 86400000 AS rts,
        |    count(*)::BIGINT AS n
        |  FROM e GROUP BY 1, 2),
        |b AS (
        |  SELECT e.event_id, e.event_type, e.ts_ms,
        |    t.rts AS b_rts, t.n AS b_n
        |  FROM e ASOF LEFT JOIN thresholds t
        |    ON e.event_type = t.event_type AND e.ts_ms >= t.rts),
        |f AS (
        |  SELECT e.event_id AS fid, t.rts AS f_rts, t.n AS f_n
        |  FROM e ASOF LEFT JOIN thresholds t
        |    ON e.event_type = t.event_type AND e.ts_ms < t.rts)
        |SELECT event_id, event_type,
        |  CASE WHEN pick_b THEN b_n
        |       WHEN f_rts IS NOT NULL THEN f_n END AS near_n,
        |  CASE WHEN pick_b THEN b_rts
        |       WHEN f_rts IS NOT NULL THEN f_rts END AS near_rts,
        |  CASE WHEN pick_b THEN 'backward'
        |       WHEN f_rts IS NOT NULL THEN 'forward' END AS asof_dir
        |FROM (
        |  SELECT *,
        |    b_rts IS NOT NULL AND
        |      (f_rts IS NULL OR (ts_ms - b_rts) <= (f_rts - ts_ms)) AS pick_b
        |  FROM b JOIN f ON fid = b.event_id) j""".stripMargin,
    "j4_introspection_diff" ->
      """WITH old AS (
        |  SELECT user_id AS o_user, event_type AS o_type, count(*) AS o_n
        |  FROM events WHERE ts < TIMESTAMP '2024-01-15' GROUP BY 1, 2),
        |neu AS (
        |  SELECT user_id AS n_user, event_type AS n_type, count(*) AS n_n
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-15' GROUP BY 1, 2)
        |SELECT coalesce(o_user, n_user) AS user_id,
        |  coalesce(o_type, n_type) AS event_type,
        |  CASE WHEN o_user IS NULL THEN 'added'
        |       WHEN n_user IS NULL THEN 'removed'
        |       WHEN o_n <> n_n THEN 'changed'
        |       ELSE 'unchanged' END AS diff
        |FROM old FULL OUTER JOIN neu
        |  ON o_user = n_user AND o_type = n_type""".stripMargin,
    "j6_trigger_overlay" ->
      """WITH triggers(trigger_id, on_type, op, known_value, target) AS (VALUES
        |  ('t1','purchase','GREATER_THAN',150.0,'amqp://high-purchase'),
        |  ('t2','error','ANY',NULL,'amqp://errors'),
        |  ('t3','click','LESS_THAN',20.0,'amqp://small-click'),
        |  ('t4','purchase','GREATER_THAN',150.0,'amqp://audit'),
        |  ('t5','signup','CONTAINS',NULL,'amqp://signup'))
        |SELECT on_type, op, round(known_value::DOUBLE, 4) AS known_value,
        |  string_agg(target, ',' ORDER BY target) AS targets,
        |  count(*) AS n_merged
        |FROM triggers GROUP BY on_type, op, known_value""".stripMargin,
    "a1_salted_totals" ->
      """SELECT event_type, count(*) AS n_msgs,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,
    "a2_exchanged_stats" ->
      """SELECT user_id, event_type, count(*) AS n_msgs,
        |  sum(length(props) + length(event_type))::BIGINT AS n_bytes
        |FROM events GROUP BY user_id, event_type""".stripMargin,
    "a5_collect_paths" ->
      """WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT user_id,
        |  string_agg(event_type, ';' ORDER BY event_type) AS paths,
        |  count(*) AS n_paths
        |FROM d GROUP BY user_id""".stripMargin,
    "w2_unset_delete" ->
      """SELECT user_id, event_type, round(value, 4) AS value
        |FROM (SELECT *, row_number() OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    "w5_path_ttl" ->
      """WITH idx AS (
        |  SELECT user_id, event_type, max(epoch_ms(ts)) AS last_seen_ms
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT max(epoch_ms(ts)) AS m FROM events)
        |SELECT user_id, event_type, last_seen_ms,
        |  last_seen_ms + 216000000 AS expiry_ms
        |FROM idx, m WHERE last_seen_ms + 216000000 > m""".stripMargin,
    "w5_paths_all" ->
      """WITH idx AS (
        |  SELECT user_id, event_type, max(epoch_ms(ts)) AS last_seen_ms
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT max(epoch_ms(ts)) AS m FROM events)
        |SELECT user_id, event_type, last_seen_ms,
        |  CASE WHEN event_type = 'click'
        |       THEN last_seen_ms + 216000000 END AS expiry_ms
        |FROM idx, m
        |WHERE event_type <> 'click' OR last_seen_ms + 216000000 > m""".stripMargin,
    "a4_old_introspection" ->
      """WITH old AS (
        |  SELECT user_id, event_type, max(event_id) % 3 AS o_major,
        |    count(*) AS o_minor
        |  FROM events WHERE ts < TIMESTAMP '2024-01-15' GROUP BY 1, 2),
        |neu AS (
        |  SELECT user_id AS n_user, event_type AS n_type,
        |    max(event_id) % 3 AS n_major
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-15' GROUP BY 1, 2)
        |SELECT o.user_id, o.event_type || ':' || o.o_major AS entry, o.o_minor
        |FROM old o LEFT JOIN neu n
        |  ON o.user_id = n.n_user AND o.event_type = n.n_type
        |WHERE n.n_major IS NULL OR n.n_major <> o.o_major""".stripMargin,
    // zlib round-trip is identity, so the oracle parses the cleartext
    "f4_properties_parse" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    'ifc' || (doc_id % 5) || '/p' || (doc_id % 7) AS e1,
        |    'ifc' || (n_chars % 5) || '/q' || (n_chars % 7) AS e2
        |  FROM documents),
        |x AS (SELECT doc_id, unnest([e1, e2]) AS entry FROM p)
        |SELECT doc_id,
        |  string_split(entry, '/')[1] AS iface,
        |  '/' || string_split(entry, '/')[2] AS path
        |FROM x WHERE string_split(entry, '/')[1] IN ('ifc0','ifc1','ifc2')""".stripMargin,
    "w4_object_projection" ->
      """SELECT DISTINCT 'device-' || user_id AS device_id,
        |  (epoch_us(ts) // 1000)::BIGINT AS reception_timestamp,
        |  ((epoch_us(ts) % 1000) * 10)::BIGINT AS submillis,
        |  event_type AS v_s,
        |  round(value, 4) AS v_d
        |FROM events WHERE user_id < 10""".stripMargin,
    // Oracle re-derives the devices fold arithmetically: totals count
    // conn+intro+disc (+3 msgs, +25 intro bytes); each data message is
    // bson(16) + iface(21) + path(7+len(type)) bytes; exchanged maps
    // count data messages only, keyed (iface, major).
    "r3_device_row" ->
      """SELECT 'device-' || user_id AS device_id,
        |  false AS connected,
        |  (min(epoch_us(ts)) // 1000 - 1)::BIGINT AS last_connection,
        |  (max(epoch_us(ts)) // 1000 + 1)::BIGINT AS last_disconnection,
        |  '10.0.0.1' AS last_seen_ip,
        |  (count(*) + 1)::BIGINT AS total_received_msgs,
        |  (sum(44 + length(event_type)) + 25)::BIGINT AS total_received_bytes,
        |  'com.bench.EventStream=1.com.bench.EventStream=' || (user_id % 4)
        |    AS intro_render,
        |  'com.bench.EventStream:1=' || count(*) AS exchanged_msgs,
        |  'com.bench.EventStream:1=' || sum(44 + length(event_type))
        |    AS exchanged_bytes
        |FROM events WHERE user_id < 20 GROUP BY user_id""".stripMargin,
    // Oracle re-derives the two-interface fold: data splits on
    // event_id parity (even → EventStream at 44+len(type) bytes, odd
    // → Aux at 36+len); totals add the 2 introspection messages and 2×43
    // introspection-payload bytes; old_introspection holds the
    // retired Aux:1 with its minor (user_id % 3).
    "r3_device_multi" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |    CASE WHEN event_id % 2 = 0
        |         THEN 'com.bench.EventStream' ELSE 'com.bench.Aux' END AS iface,
        |    CASE WHEN event_id % 2 = 0
        |         THEN 44 + length(event_type)
        |         ELSE 36 + length(event_type) END AS bytes
        |  FROM events WHERE user_id < 10),
        |per_iface AS (
        |  SELECT user_id, iface, count(*) AS n, sum(bytes) AS b
        |  FROM e GROUP BY 1, 2),
        |ex AS (
        |  SELECT user_id,
        |    string_agg(iface || ':1=' || n, ',' ORDER BY iface) AS exchanged_msgs,
        |    string_agg(iface || ':1=' || b, ',' ORDER BY iface) AS exchanged_bytes
        |  FROM per_iface GROUP BY user_id),
        |tot AS (
        |  SELECT user_id,
        |    (count(*) + 2)::BIGINT AS msgs,
        |    (sum(bytes) + 86)::BIGINT AS bytes,
        |    (min(epoch_us(ts)) // 1000 - 2)::BIGINT AS last_conn,
        |    (max(epoch_us(ts)) // 1000 + 2)::BIGINT AS last_disc
        |  FROM e GROUP BY user_id)
        |SELECT 'device-' || t.user_id AS device_id,
        |  false AS connected,
        |  t.last_conn AS last_connection,
        |  t.last_disc AS last_disconnection,
        |  t.msgs AS total_received_msgs,
        |  t.bytes AS total_received_bytes,
        |  'com.bench.Aux=2,com.bench.EventStream=1.com.bench.Aux='
        |    || (t.user_id % 3) || ',com.bench.EventStream=0' AS intro_render,
        |  'com.bench.Aux:1=' || (t.user_id % 3) AS old_render,
        |  x.exchanged_msgs, x.exchanged_bytes
        |FROM tot t JOIN ex x ON x.user_id = t.user_id""".stripMargin,
    "w9_introspection_maps" ->
      """WITH c AS (
        |  SELECT user_id, event_type || ':' || count(*) AS entry
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  string_agg(entry, ',' ORDER BY entry) AS introspection
        |FROM c GROUP BY user_id""".stripMargin,
    "r6_blob_as_int" ->
      """SELECT doc_id, ('0x' || substr(md5(source), 1, 8))::BIGINT AS blob_int
        |FROM documents""".stripMargin,
    "st_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g),
        |per AS (
        |  SELECT user_id, session_id, count(*) AS session_events
        |  FROM sess GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        |  max(session_events) AS max_session_events
        |FROM per GROUP BY user_id""".stripMargin,
    "vm_truth_table" ->
      """SELECT event_id,
        |  value > 100.0 AS gt,
        |  value <= 100.0 AS lte,
        |  event_type = 'error' AS eq,
        |  event_type <> 'error' AS neq,
        |  contains(event_type, 'ick') AS str_contains,
        |  list_contains(string_split(event_type, 'a'), 'se') AS arr_contains,
        |  true AS any
        |FROM events WHERE event_id < 200""".stripMargin
  )
}
