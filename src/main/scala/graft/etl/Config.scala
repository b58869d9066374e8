package graft.etl

/** Tolerant intake configuration — the reference's `load_cfg`
  * (streamlit_app.py:37-50): missing or blank settings never throw,
  * they degrade to OFFLINE mode (no sink; validation and manifest
  * still run, mirroring the reference's always-available offline ZIP
  * path, streamlit_app.py:333). `allowXlsx` mirrors the reference's
  * feature gate (streamlit_app.py:49).
  */
final case class GraftConfig(
    sinkUri: Option[String],
    maxFileMb: Int = 50,
    allowXlsx: Boolean = true) {
  def offline: Boolean = sinkUri.isEmpty
}

object GraftConfig {

  val SinkKey = "graft.sink.uri"
  val MaxFileMbKey = "graft.intake.maxFileMb"
  val AllowXlsxKey = "graft.intake.allowXlsx"

  /** Build from a settings map (secrets/conf analogue). Absent sink →
    * offline; malformed numbers fall back to defaults rather than
    * failing the whole intake (the reference swallows config errors
    * the same way).
    */
  def load(settings: Map[String, String]): GraftConfig = GraftConfig(
    sinkUri = settings.get(SinkKey).map(_.trim).filter(_.nonEmpty),
    maxFileMb = settings.get(MaxFileMbKey)
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption).filter(_ > 0).getOrElse(50),
    allowXlsx = settings.get(AllowXlsxKey).forall(_.trim.equalsIgnoreCase("true")))
}
