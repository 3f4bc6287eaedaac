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

  test("parse validates partition and resource prefix (arn.go:30-42)") {
    assert(Arn.parse("arn:gcp:kinesis:r:a:stream/x").isLeft)
    assert(Arn.parse("arn:aws:s3:r:a:bucket/x").isLeft)
    assert(Arn.parse("arn:aws:kinesis:r:a:wrongprefix/x").isLeft)
    assert(Arn.parse("arn:aws:firehose:r:a:deliverystream/x").isRight)
    assert(Arn.parse("arn:aws:*:r:a:*/anything").isRight)
  }

  test("bare '*' shorthand expands to the all-wildcard ARN (arn.go:17-25)") {
    val all = Arn.unsafe("*")
    assert(all == Arn("*", "*", "*", "*", "*/*"))
    assert(all.matches(concrete))
    assert(!all.isConcrete)
  }

  test("streamName strips the resource-type prefix (arn.go:88-91)") {
    assert(Arn.streamName(concrete) == "input-stream")
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
    assert(!Arn.unsafe("arn:aws:firehose:*:*:deliverystream/*").matches(concrete))
  }

  test("isConcrete") {
    assert(concrete.isConcrete)
    assert(!Arn.unsafe("arn:aws:kinesis:*:*:stream/*").isConcrete)
  }

  test("refCompat mode reproduces the reference's unanchored matching (arn.go:93-107)") {
    // the documented divergence case: once a '*' is present, literal
    // pieces match as unanchored substrings in the reference
    assert(Arn.segMatchCompat("stream/foo*", "xstream/fooy"))
    assert(!Arn.segMatch("stream/foo*", "xstream/fooy"))
    // wildcard-free segments stay exact-equality in both modes
    assert(!Arn.segMatchCompat("stream/foo", "xstream/foo"))
    // whole-ARN: compat flag widens, default stays anchored
    val loose = Arn.unsafe("arn:aws:kinesis:*:*:stream/in*")
    // 'stream/in' occurs mid-resource ('.../stream/inner'), not as a prefix
    val victim = Arn.unsafe("arn:aws:kinesis:r:a:stream/foo-stream/inner")
    assert(!loose.matches(victim))
    assert(loose.matches(victim, refCompat = true))
  }

  test("property: anchored glob match implies compat match (strictly stricter)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab*"
    def randStr(maxLen: Int, alpha: String): String =
      (0 until rnd.nextInt(maxLen + 1)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    var implications = 0
    for (_ <- 1 to 5000) {
      val pattern = randStr(6, alphabet)
      val value = randStr(8, "ab")
      val anchored = Arn.segMatch(pattern, value)
      val compat = Arn.segMatchCompat(pattern, value)
      if (anchored) { assert(compat, s"anchored matched but compat didn't: '$pattern' vs '$value'"); implications += 1 }
      if (!pattern.contains("*"))
        assert(anchored == compat, s"wildcard-free must agree: '$pattern' vs '$value'")
    }
    assert(implications > 100) // the generator actually exercised matches
  }
}
