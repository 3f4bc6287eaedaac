package graft.config

/** ARN parsing + wildcard stream routing.
  *
  * Same semantics as the reference's router (`/root/reference/arn.go:12-107`):
  * a 5-part ARN `arn:partition:service:region:account:resource` where each
  * segment of a *pattern* may contain `*` glob wildcards; a config counter
  * runs over an event iff its `input_stream_arn` pattern matches the event
  * source ARN. Routing is pure driver-side config matching — it never
  * touches data, so it costs nothing at any scale.
  */
final case class Arn(
    partition: String,
    service: String,
    region: String,
    accountId: String,
    resource: String) {
  override def toString: String =
    s"arn:$partition:$service:$region:$accountId:$resource"

  def isConcrete: Boolean =
    !productIterator.exists(_.asInstanceOf[String].contains("*"))

  /** Does this (possibly wildcarded) ARN pattern match the concrete `other`?
    * Anchored glob semantics (the default — see [[Arn.segMatch]]).
    */
  def matches(other: Arn): Boolean = matches(other, refCompat = false)

  /** As [[matches]]; `refCompat = true` selects the reference-exact
    * UNANCHORED matcher ([[Arn.segMatchCompat]], `arn.go:93-107`) for
    * configs that depend on the reference's looser behavior.
    */
  def matches(other: Arn, refCompat: Boolean): Boolean = {
    val seg: (String, String) => Boolean =
      if (refCompat) Arn.segMatchCompat else Arn.segMatch
    seg(partition, other.partition) &&
      seg(service, other.service) &&
      seg(region, other.region) &&
      seg(accountId, other.accountId) &&
      seg(resource, other.resource)
  }
}

object Arn {
  /** Parse `arn:aws:kinesis:region:acct:stream/name`; resource keeps any
    * `:`/`/`. Mirrors the reference's `ARN.Set` (`arn.go:16-43`): the bare
    * `"*"` shorthand expands to the all-wildcard ARN (`arn.go:17-25`), the
    * partition must be `aws`, and the service/resource pair must be a
    * kinesis `stream/…`, a firehose `deliverystream/…`, or the wildcard
    * `*`/`*​/…` form (`arn.go:30-42`).
    */
  def parse(s: String): Either[String, Arn] = {
    if (s == "*") return Right(Arn("*", "*", "*", "*", "*/*"))
    val parts = s.split(":", 6)
    if (parts.length != 6 || parts(0) != "arn") Left(s"invalid ARN: $s")
    else {
      val arn = Arn(parts(1), parts(2), parts(3), parts(4), parts(5))
      if (arn.partition != "aws" && arn.partition != "*")
        Left(s"ARN partition is not aws: $s")
      else if (arn.service == "kinesis" && arn.resource.startsWith("stream/"))
        Right(arn)
      else if (arn.service == "firehose" && arn.resource.startsWith("deliverystream/"))
        Right(arn)
      else if (arn.service == "*" && arn.resource.startsWith("*/"))
        Right(arn)
      else
        Left(s"ARN is not a kinesis data stream or firehose delivery stream: $s")
    }
  }

  def unsafe(s: String): Arn =
    parse(s).fold(e => throw new IllegalArgumentException(e), identity)

  /** Resource name after the `type/` prefix (reference `arn.go:88-91`). */
  def streamName(arn: Arn): String = arn.resource.split("/", 2).last

  /** Glob match one segment: `*` matches any run of characters.
    *
    * Intentional (stricter) divergence from the reference: its `matchPart`
    * (`arn.go:93-107`) does UNANCHORED in-order substring matching once a
    * `*` is present — e.g. pattern `stream/foo*` matches `xstream/fooy`.
    * Here the glob is anchored (`stream/foo*` matches only values that
    * START with `stream/foo`), which is the documented intent of wildcard
    * ARN routing; the reference's behavior looks like an accident of its
    * scanning loop.
    */
  private[graft] def segMatch(pattern: String, value: String): Boolean = {
    if (!pattern.contains("*")) return pattern == value
    // Convert the glob to an anchored regex; quote everything else.
    val rx = pattern.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*")
    value.matches(rx)
  }

  /** Reference-exact segment matcher (`arn.go:93-107`), for configs that
    * rely on the reference's behavior: once a `*` is present, the literal
    * pieces are scanned as UNANCHORED in-order substrings — `stream/foo*`
    * matches `xstream/fooy`. The scan also reproduces the reference's
    * relative-index arithmetic (`index = nextIndex + len(part)`, with
    * `nextIndex` relative to the sliced string rather than the whole), so
    * later pieces may re-scan text before the previous match — behavioral
    * parity, quirks included, guarded by a property test against the
    * anchored matcher.
    */
  private[graft] def segMatchCompat(pattern: String, value: String): Boolean = {
    if (!pattern.contains("*")) return pattern == value
    val parts = pattern.split("\\*", -1)
    var index = 0
    parts.forall { part =>
      val next = value.substring(math.min(index, value.length)).indexOf(part)
      if (next == -1) false
      else { index = next + part.length; true }
    }
  }
}
