package graft.core

/** One detected PII entity.
  *
  * Mirrors the reference hit dict `{type, text, conf, reason}`
  * (reference: app/detectors.py:30-33, app/security_manager.py:196-210) with
  * explicit character offsets added — the reference recovers position later by
  * substring search (app/render_img.py:104); `java.util.regex.Matcher` gives the
  * exact offsets for free, so we carry them from the start.
  *
  * `start`/`end` are Java String (UTF-16 code unit) offsets; identical to Python
  * codepoint offsets for all BMP text, which our fixtures pin.
  */
final case class Hit(
    kind: String,
    text: String,
    start: Int,
    end: Int,
    conf: Double,
    reason: String
)
