package graft

import graft.config.Arn
import org.scalatest.funsuite.AnyFunSuite

/** Wildcard ARN routing semantics (reference `arn_test.go:11-92`). */
class ArnSpec extends AnyFunSuite {
  private val concrete =
    Arn.unsafe("arn:aws:kinesis:ap-northeast-1:111122223333:stream/input-stream")

  test("parse round-trips") {
    assert(concrete.toString ==
      "arn:aws:kinesis:ap-northeast-1:111122223333:stream/input-stream")
    assert(concrete.partition == "aws")
    assert(concrete.service == "kinesis")
    assert(concrete.resource == "stream/input-stream")
  }

  test("parse rejects non-ARNs") {
    assert(Arn.parse("not-an-arn").isLeft)
    assert(Arn.parse("arn:aws:kinesis").isLeft)
  }

  test("exact match") {
    assert(concrete.matches(concrete))
    assert(!Arn.unsafe("arn:aws:kinesis:ap-northeast-1:111122223333:stream/other")
      .matches(concrete))
  }

  test("segment wildcards") {
    assert(Arn.unsafe("arn:aws:kinesis:*:*:stream/input-stream").matches(concrete))
    assert(Arn.unsafe("arn:aws:kinesis:*:*:stream/*").matches(concrete))
    assert(Arn.unsafe("arn:aws:kinesis:*:*:stream/input-*").matches(concrete))
    assert(!Arn.unsafe("arn:aws:kinesis:*:*:stream/output-*").matches(concrete))
    assert(!Arn.unsafe("arn:aws:firehose:*:*:*").matches(concrete))
  }

  test("isConcrete") {
    assert(concrete.isConcrete)
    assert(!Arn.unsafe("arn:aws:kinesis:*:*:stream/*").isConcrete)
  }
}
