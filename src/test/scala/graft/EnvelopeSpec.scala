package graft

import graft.operators.Envelope
import org.apache.spark.sql.functions._

/** Record-level semantics of the reference's data plane (SURVEY.md §5.2):
  * enrichment round-trips, wire formats, guards.
  */
class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  test("P4: JSON enrichment preserves unknown payload keys and adds only ess_ fields") {
    val df = Seq(
      ("""{"message_type": "x", "custom_key": {"deep": [1, 2]}, "z": null}""", 7L, 123L),
      ("""{}""", 8L, 124L)
    ).toDF("body", "ordinal", "ts_ms")
    val out = df.select(
      Envelope.enrichJson($"body", $"ordinal", $"ts_ms").as("wire")).as[String].collect()

    assert(out(0) ===
      """{"ess_ordinal": 7, "ess_timestamp": 123, "message_type": "x", "custom_key": {"deep": [1, 2]}, "z": null}""")
    assert(out(1) === """{"ess_ordinal": 8, "ess_timestamp": 124}""")
    // parse back: enrichment output is valid JSON and keys survive
    val parsed = spark.createDataset(out.toSeq).select(
      get_json_object($"value", "$.custom_key.deep[1]").as("deep"),
      get_json_object($"value", "$.ess_ordinal").as("o")).collect()
    assert(parsed(0).getString(0) === "2")
    assert(parsed(0).getString(1) === "7")
  }

  test("P5: protobuf-text enrichment appends exactly |ordinal: N|timestamp: M") {
    val df = Seq(("cls|body: \"v\"", 2L, 1746042171620L)).toDF("body", "ordinal", "ts_ms")
    val out = df.select(
      Envelope.enrichProtoText($"body", $"ordinal", $"ts_ms").as("wire")).as[String].head()
    assert(out === "cls|body: \"v\"|ordinal: 2|timestamp: 1746042171620")
  }

  test("P9: client-side split recovers class/body/ordinal/timestamp") {
    val wire = "accountserver.MerchantCharge|merchant_id: 1|ordinal: 2|timestamp: 99"
    val parts = Seq(wire).toDF("w")
      .select(Envelope.splitProtoText($"w").as("p"))
      .select($"p"(0), $"p"(1), $"p"(2), $"p"(3)).head()
    assert(parts.getString(0) === "accountserver.MerchantCharge")
    assert(parts.getString(1) === "merchant_id: 1")
    assert(parts.getString(2) === "ordinal: 2")
    assert(parts.getString(3) === "timestamp: 99")
  }

  test("P6+P7: forwardable drops empty, null and POISON bodies") {
    val df = Seq(Some("ok"), Some(""), Some("POISON"), None)
      .toDF("body")
    val kept = df.filter(Envelope.forwardable($"body")).as[String].collect()
    assert(kept.toSeq === Seq("ok"))
  }

  test("P1: utf-8 decode round-trip nulls out invalid byte sequences") {
    val good = "héllo".getBytes("UTF-8")
    val bad = Array[Byte](-1, -2, 65) // invalid UTF-8 lead bytes
    val df = Seq(Tuple1(good), Tuple1(bad)).toDF("raw")
    val out = df.select(Envelope.decodeUtf8($"raw").as("s")).collect()
    assert(out(0).getString(0) === "héllo")
    assert(out(1).isNullAt(0))
  }

  test("P2: format dispatch on first char") {
    val df = Seq("{\"a\":1}", "cls|x: 1").toDF("body")
    assert(df.filter(Envelope.isJson($"body")).count() === 1)
  }

  test("P10: location projection") {
    val loc = Seq("abc123").toDF("uuid")
      .select(Envelope.location($"uuid", secure = true, host = "h:8080")).as[String].head()
    assert(loc === "wss://h:8080/event-stream/abc123")
  }

  test("P4 regression: whitespace-only object body yields valid JSON, no trailing comma") {
    val df = Seq(("{ }", 1L, 2L), ("{  \t }", 3L, 4L)).toDF("body", "ordinal", "ts_ms")
    val out = df.select(Envelope.enrichJson($"body", $"ordinal", $"ts_ms").as("w")).as[String].collect()
    assert(out(0) === """{"ess_ordinal": 1, "ess_timestamp": 2}""")
    assert(out(1) === """{"ess_ordinal": 3, "ess_timestamp": 4}""")
    out.foreach(w => assert(!w.contains(", }") && !w.contains(",}")))
  }

  test("P3 regression: isValidJson rejects malformed, accepts valid") {
    val df = Seq("{oops", """{"a": 1}""", "{", "{}").toDF("body")
    val got = df.select(Envelope.isValidJson($"body").as("v")).as[Boolean].collect()
    assert(got.toSeq === Seq(false, true, false, true))
  }

  test("P5 fidelity: reproduces the reference A2 fixture wire bytes exactly (FIXTURES.md)") {
    // reference/README.md:137-145 / ampq_publisher.py:38-52 wire sample
    val body = "accountserver.MerchantCharge|timestamp: \"2025-04-30T19:20:37.926+00:00\" " +
      "merchant_kind: \"DATA_MANAGER\" merchant_name: \"squonk\" merchant_id: 1 " +
      "operation: OPERATION_ENUM_PROCESSING auth_code: 456782 value: \"0.50\" sqn: 1"
    val wire = Seq((body, 2L, 1746042171620L)).toDF("body", "ordinal", "ts_ms")
      .select(Envelope.enrichProtoText($"body", $"ordinal", $"ts_ms")).as[String].head()
    assert(wire === body + "|ordinal: 2|timestamp: 1746042171620")
    // and the client-side split recovers the reference's four sections
    val parts = Seq(wire).toDF("w").select(Envelope.splitProtoText($"w").as("p"))
      .select(expr("size(p)"), $"p"(0), $"p"(2), $"p"(3)).head()
    assert(parts.getInt(0) === 4)
    assert(parts.getString(1) === "accountserver.MerchantCharge")
    assert(parts.getString(2) === "ordinal: 2")
    assert(parts.getString(3) === "timestamp: 1746042171620")
  }

  test("P9 typed: protoTextField decodes the A2 fixture's fields, null when absent") {
    // exact A2 body (FIXTURES.md §A2 / ampq_publisher.py:38-52): quoted
    // strings (ISO timestamp with colons inside the quotes), bare numerics
    val body = "timestamp: \"2025-04-30T19:20:37.926+00:00\" " +
      "merchant_kind: \"DATA_MANAGER\" merchant_name: \"squonk\" merchant_id: 1 " +
      "operation: OPERATION_ENUM_PROCESSING auth_code: 456782 value: \"0.50\" sqn: 1"
    val r = Seq(body).toDF("b").select(
      Envelope.protoTextField($"b", "timestamp").as("ts"),
      Envelope.protoTextField($"b", "merchant_kind").as("mk"),
      Envelope.protoTextField($"b", "merchant_id").cast("long").as("mid"),
      Envelope.protoTextField($"b", "operation").as("op"),
      Envelope.protoTextField($"b", "value").as("v"),
      Envelope.protoTextField($"b", "nope").as("absent")).head()
    assert(r.getString(0) === "2025-04-30T19:20:37.926+00:00")
    assert(r.getString(1) === "DATA_MANAGER")
    assert(r.getLong(2) === 1L)
    assert(r.getString(3) === "OPERATION_ENUM_PROCESSING")
    assert(r.getString(4) === "0.50")
    assert(r.isNullAt(5))
  }

  test("P9 regression: fields directly after a '|' separator are found (enriched wire body)") {
    // the enriched wire format is pipe-delimited (P5): extracting the
    // appended ordinal/timestamp from a wire body must work
    val wire = "merchant_kind: \"X\" sqn: 7|ordinal: 42|timestamp: 1705000000000"
    val r = Seq(wire).toDF("b").select(
      Envelope.protoTextField($"b", "ordinal").cast("long").as("ord"),
      Envelope.protoTextField($"b", "timestamp").cast("long").as("ts"),
      Envelope.protoTextField($"b", "sqn").cast("long").as("sqn")).head()
    assert(r.getLong(0) === 42L)
    assert(r.getLong(1) === 1705000000000L)
    assert(r.getLong(2) === 7L)
  }
}
