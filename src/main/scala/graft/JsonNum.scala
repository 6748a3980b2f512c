package graft

/** Locale-fixed numeric rendering for the harness's one-line JSON
  * emissions. Both `"%.3f".format(v)` and the `f"$v%.3f"` interpolator
  * format under the JVM DEFAULT locale, so on a comma-decimal locale
  * (de_DE, fr_FR, …) they render `10,300` — malformed inside a JSON
  * document and silently misparsed by the driver's metric reader.
  * Every JSON-emitting main routes its floats through here. */
object JsonNum {
  def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
}
