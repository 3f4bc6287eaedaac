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

  /** Does this (possibly wildcarded) ARN pattern match the concrete `other`? */
  def matches(other: Arn): Boolean =
    Arn.segMatch(partition, other.partition) &&
      Arn.segMatch(service, other.service) &&
      Arn.segMatch(region, other.region) &&
      Arn.segMatch(accountId, other.accountId) &&
      Arn.segMatch(resource, other.resource)
}

object Arn {
  /** Parse `arn:aws:kinesis:region:acct:stream/name`; resource keeps any `:`/`/`. */
  def parse(s: String): Either[String, Arn] = {
    val parts = s.split(":", 6)
    if (parts.length != 6 || parts(0) != "arn")
      Left(s"invalid ARN: $s")
    else
      Right(Arn(parts(1), parts(2), parts(3), parts(4), parts(5)))
  }

  def unsafe(s: String): Arn =
    parse(s).fold(e => throw new IllegalArgumentException(e), identity)

  /** Glob match one segment: `*` matches any run of characters. */
  private[config] def segMatch(pattern: String, value: String): Boolean = {
    if (!pattern.contains("*")) return pattern == value
    // Convert the glob to an anchored regex; quote everything else.
    val rx = pattern.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*")
    value.matches(rx)
  }
}
