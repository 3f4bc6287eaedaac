package graft.config

import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

/** Engine-version constraint checking — the reference's `required_version`
  * gate (`/root/reference/config.go:54-61,122-138`, backed by hashicorp
  * go-version). Supported operators: `=`, `!=`, `>`, `>=`, `<`, `<=`, `~>`
  * (pessimistic), comma-separated conjunction.
  */
final case class VersionConstraint(raw: String) {
  import VersionConstraint._

  /** Parsed `(operator, version)` conjunction — public so callers can
    * compile the identical check into another evaluator (e.g. a Catalyst
    * `Column` predicate, see `graft.operators.Intermediate.versionCheck`).
    */
  val clauses: Seq[(String, SemVer)] = raw.split(",").toSeq.map { part =>
    val t = part.trim
    val m = ClauseRe.findFirstMatchIn(t).getOrElse(
      throw new IllegalArgumentException(s"required_version has invalid format: '$t'"))
    val op = Option(m.group(1)).filter(_.nonEmpty).getOrElse("=")
    (op, SemVer.parse(m.group(2)))
  }

  def check(version: String): Boolean = {
    val v = SemVer.parse(version)
    clauses.forall { case (op, c) =>
      val cmp = v.compare(c)
      op match {
        case "="  => cmp == 0
        case "!=" => cmp != 0
        case ">"  => cmp > 0
        case ">=" => cmp >= 0
        case "<"  => cmp < 0
        case "<=" => cmp <= 0
        case "~>" => // pessimistic: ~>1.2.3 ⇒ [1.2.3, 1.3); ~>1.2 ⇒ [1.2, 2.0)
          cmp >= 0 && v.major == c.major && (!c.patchSpecified || v.minor == c.minor)
      }
    }
  }
}

object VersionConstraint {
  private val ClauseRe: Regex = """^(=|!=|>=|<=|>|<|~>)?\s*([0-9][0-9A-Za-z.\-]*)$""".r

  final case class SemVer(major: Int, minor: Int, patch: Int, patchSpecified: Boolean)
      extends Ordered[SemVer] {
    def compare(o: SemVer): Int = {
      val a = Ordering[Int].compare(major, o.major)
      if (a != 0) a else {
        val b = Ordering[Int].compare(minor, o.minor)
        if (b != 0) b else Ordering[Int].compare(patch, o.patch)
      }
    }
  }

  object SemVer {
    def parse(s: String): SemVer = {
      val core = s.takeWhile(c => c != '-' && c != '+') // ignore pre-release/build
      val parts = core.split("\\.")
      def num(i: Int): Int =
        if (i < parts.length) parts(i).toIntOption.getOrElse(
          throw new IllegalArgumentException(s"invalid version: '$s'"))
        else 0
      SemVer(num(0), num(1), num(2), patchSpecified = parts.length >= 3)
    }
  }
}

/** Top-level engine configuration (`/root/reference/config.go:17-23`).
  * `arnMatchCompat` (YAML `arn_match_compat`, default false) opts into the
  * reference's unanchored wildcard ARN matching (`arn.go:93-107`) for
  * configs that depend on it; the default is the stricter anchored glob.
  */
final case class AppConfig(
    requiredVersion: Option[String],
    counters: Seq[CounterDef],
    arnMatchCompat: Boolean = false) {

  /** `Restrict()` (`config.go:52-75`): version gate + per-counter rules. */
  def validate(engineVersion: String = ConfigLoader.EngineVersion): Either[String, AppConfig] = {
    val versionOk = requiredVersion match {
      case None => Right(())
      case Some(rv) =>
        val c = try Right(VersionConstraint(rv)) catch {
          case e: IllegalArgumentException => Left(e.getMessage)
        }
        c.flatMap { vc =>
          if (vc.check(engineVersion)) Right(())
          else Left(s"version $engineVersion does not satisfy required_version '$rv'")
        }
    }
    for {
      _ <- versionOk
      _ <- if (counters.isEmpty) Left("must configure any counter") else Right(())
      _ <- counters.foldLeft[Either[String, Unit]](Right(())) { (acc, c) =>
        acc.flatMap(_ => c.validate.map(_ => ()))
      }
    } yield this
  }
}

/** YAML config loader (`config.go:46-52` via kayac/go-config): snakeyaml
  * parse + `{{ env "NAME" "default" }}` / `{{ must_env "NAME" }}` template
  * expansion, matching the reference's LoadWithEnv behavior.
  */
object ConfigLoader {

  /** This engine's version, checked against `required_version`. */
  val EngineVersion = "0.1.0"

  private val EnvRe: Regex =
    """\{\{\s*(must_env|env)\s+"([^"]+)"(?:\s+"([^"]*)")?\s*\}\}""".r

  /** Expand `{{ env ... }}` / `{{ must_env ... }}` templates. */
  private[config] def expandEnv(yaml: String, env: Map[String, String]): String =
    EnvRe.replaceAllIn(yaml, m => {
      val fn = m.group(1); val name = m.group(2); val dflt = Option(m.group(3))
      val v = env.get(name).orElse(dflt).getOrElse {
        if (fn == "must_env")
          throw new IllegalArgumentException(s"must_env: environment variable $name is not set")
        else ""
      }
      Regex.quoteReplacement(v)
    })

  def fromYaml(yaml: String,
               env: Map[String, String] = sys.env): Either[String, AppConfig] = {
    val expanded =
      try expandEnv(yaml, env)
      catch { case e: IllegalArgumentException => return Left(e.getMessage) }
    val root =
      try {
        val parsed = new org.yaml.snakeyaml.Yaml().load[Any](expanded)
        parsed match {
          case m: java.util.Map[_, _] =>
            m.asScala.toMap.map { case (k, v) => (String.valueOf(k), v) }
          case _ => return Left("config root must be a YAML mapping")
        }
      } catch { case e: Exception => return Left(s"yaml parse error: ${e.getMessage}") }

    val requiredVersion = root.get("required_version").collect { case s: String => s }
    val arnCompat = root.get("arn_match_compat").exists {
      case b: java.lang.Boolean => b.booleanValue()
      case s: String => s == "true"
      case _ => false
    }
    val countersRaw = root.get("counters") match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq
      case Some(_) => return Left("counters must be a list")
      case None => Nil
    }
    val counters = countersRaw.zipWithIndex.map {
      case (m: java.util.Map[_, _], i) =>
        parseCounter(m.asScala.toMap.map { case (k, v) => (String.valueOf(k), v) }) match {
          case Right(c) => c
          case Left(err) => return Left(s"counters[$i]: $err")
        }
      case (_, i) => return Left(s"counters[$i]: must be a mapping")
    }
    AppConfig(requiredVersion, counters, arnCompat).validate()
  }

  private def str(m: Map[String, Any], k: String): Option[String] =
    m.get(k).collect { case v if v != null => String.valueOf(v) }

  private def parseCounter(m: Map[String, Any]): Either[String, CounterDef] = {
    for {
      ct <- str(m, "counter_type") match {
        case None => Right(CounterType.Count) // zero value, as in the reference
        case Some(s) => CounterType.fromName(s)
      }
      input <- parseArn(m, "input_stream_arn")
      output <- parseArn(m, "output_stream_arn")
      agg <- parseArn(m, "aggregate_stream_arn")
      qppm <- str(m, "quantile_ppm") match {
        case None => Right(500000L)
        case Some(s) => s.toLongOption.toRight(s"quantile_ppm must be an integer: $s")
      }
      topk <- str(m, "top_k") match {
        case None => Right(3)
        case Some(s) => s.toIntOption.toRight(s"top_k must be an integer: $s")
      }
    } yield CounterDef(
      id = str(m, "id").getOrElse(""),
      counterType = ct,
      targetColumn = str(m, "target_column"),
      targetExpr = str(m, "target_expr"),
      inputStreamArn = input,
      outputArn = output,
      aggregateStreamArn = agg,
      windowDuration = str(m, "window_duration").getOrElse("1 hour"),
      jqExpr = str(m, "jq_expr"),
      siphashKeyHex = str(m, "siphash_key_hex").getOrElse(CounterDef.DefaultSipHashKeyHex),
      // extension-type parameters; inert for count/ACD configs
      quantilePpm = qppm,
      topK = topk)
  }

  private def parseArn(m: Map[String, Any], k: String): Either[String, Option[Arn]] =
    str(m, k) match {
      case None => Right(None)
      case Some(s) => Arn.parse(s).map(Some(_)).left.map(e => s"$k: $e")
    }

  def loadFile(path: String,
               env: Map[String, String] = sys.env): Either[String, AppConfig] =
    try fromYaml(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"), env)
    catch { case e: java.io.IOException => Left(s"cannot read $path: ${e.getMessage}") }
}
