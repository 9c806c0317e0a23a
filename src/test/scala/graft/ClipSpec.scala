package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Clip

/** Clip JSON rendering: escaping, numeric/temporal/nested types. */
class ClipSpec extends AnyFunSuite {

  test("escapes strings and control characters") {
    val json = Clip(Map("q" -> "he\"llo\\wor\nld\t"), Seq.empty).asJson
    assert(json.contains("\"he\\\"llo\\\\wor\\nld\\t\\u0001\""))
  }

  test("renders numbers, booleans, nulls, NaN") {
    val json = Clip(Map.empty, Seq(Map(
      "l" -> 42L, "d" -> 1.5, "b" -> true, "n" -> null, "nan" -> Double.NaN))).asJson
    assert(json.contains("\"l\":42"))
    assert(json.contains("\"d\":1.5"))
    assert(json.contains("\"b\":true"))
    assert(json.contains("\"n\":null"))
    assert(json.contains("\"nan\":null"))
  }

  test("renders timestamps as ISO instants and nests maps/seqs") {
    val ts = Timestamp.valueOf("2026-01-01 10:00:00")
    val json = Clip(Map("meta" -> Map("k" -> Seq(1, 2))), Seq(Map("t" -> ts))).asJson
    assert(json.contains("\"k\":[1,2]"))
    assert(json.contains("\"t\":\"2026-01-01T10:00:00Z\""))
  }
}
