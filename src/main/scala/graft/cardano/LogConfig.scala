package graft.cardano

/** File-driven logging configuration with reference parity
  * (`/root/reference/app/main.py:404-415`, `/root/reference/logging.yaml`):
  * the reference reads `logging.yaml` at startup, overrides the app
  * logger's level with `settings.log_level`, and hands the dict to
  * `logging.config.dictConfig`. Here the same file dialect configures
  * log4j2 (the JVM/Spark logging fabric): per-logger levels come from the
  * file, and `PANTASIA_LOG_LEVEL` still wins for the app logger — the
  * exact layering `main.py` applies
  * (`log_config['loggers']['pantasia-db-sync']['level'] = settings.log_level`).
  *
  * Only the subset of YAML the reference's file actually uses is parsed
  * (two-space block indentation, `key: value` scalars): the `loggers:`
  * tree's per-logger `level:` entries and the `root:` block's `level:`.
  * Handler/formatter wiring stays with log4j2's own configuration — the
  * JVM equivalent of python's handler objects — so this layer only
  * routes LEVELS, which is the per-subsystem verbosity knob an operator
  * actually reaches for (driver chatty, Spark quiet).
  */
object LogConfig {

  /** The reference's application logger name (`main.py:413`). */
  val AppLogger = "pantasia-db-sync"

  /** Root pseudo-name in the parsed map (the `root:` block). */
  val Root = ""

  /** Parse per-logger levels from the reference's `logging.yaml`
    * dialect. Returns `loggerName -> LEVEL` with [[Root]] (empty
    * string) carrying the `root:` block's level. Unknown keys and the
    * handler/formatter sections are ignored, comments and blanks
    * skipped. Tabs count as indentation failures nowhere — the
    * reference file is space-indented and so is this dialect.
    */
  def parseLoggerLevels(text: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var section = ""   // current top-level block name
    var logger = ""    // current logger under `loggers:`
    for (raw <- text.linesIterator) {
      val t = raw.trim
      if (t.nonEmpty && !t.startsWith("#")) {
        val indent = raw.takeWhile(_ == ' ').length
        if (indent == 0) {
          section = if (t.endsWith(":")) t.dropRight(1).trim else ""
          logger = ""
          // (root's children arrive at indent 2 below)
        } else if (section == "loggers" && indent == 2 && t.endsWith(":")) {
          logger = t.dropRight(1).trim
        } else if (section == "loggers" && indent >= 4 && logger.nonEmpty &&
            t.startsWith("level:")) {
          out += logger -> t.stripPrefix("level:").trim
        } else if (section == "root" && t.startsWith("level:")) {
          out += Root -> t.stripPrefix("level:").trim
        }
      }
    }
    out.result()
  }

  /** The levels that would be APPLIED: file levels layered under the
    * env override — `settings.logLevel` replaces the app logger's
    * level exactly as `main.py:411` does, and supplies it even when the
    * file has no entry (env-only deployments keep working). Pure, so
    * the precedence is unit-testable without touching global state.
    */
  def effectiveLevels(settings: Settings, fileText: Option[String]): Map[String, String] = {
    val fromFile = fileText.map(parseLoggerLevels).getOrElse(Map.empty)
    fromFile + (AppLogger -> settings.logLevel)
  }

  private def toLevel(s: String): org.apache.logging.log4j.Level =
    org.apache.logging.log4j.Level.toLevel(s, org.apache.logging.log4j.Level.INFO)

  /** Apply: read `settings.logConfig` (the `PANTASIA_LOG_CONFIG` path)
    * if set and present, layer `PANTASIA_LOG_LEVEL` on top, and push
    * the result into log4j2. Returns what was applied.
    */
  def apply(settings: Settings): Map[String, String] = {
    val fileText =
      Option(settings.logConfig).filter(_.nonEmpty)
        .map(java.nio.file.Paths.get(_))
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8))
    val levels = effectiveLevels(settings, fileText)
    import org.apache.logging.log4j.core.config.Configurator
    levels.foreach {
      case (Root, lvl) => Configurator.setRootLevel(toLevel(lvl))
      case (name, lvl) => Configurator.setLevel(name, toLevel(lvl))
    }
    levels
  }
}
