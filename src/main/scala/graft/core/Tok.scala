package graft.core

/** Cross-engine tokenization constants.
  *
  * Java regex `\s` matches `[ \t\n\x0B\f\r]` but RE2 (DuckDB) `\s` omits
  * vertical tab `\x0B` — a text containing one would shingle differently in
  * Spark vs the oracle. Both engines read this spelled-out class
  * identically, so every tokenizer that feeds an oracle-checked query uses
  * it instead of `\s`.
  */
object Tok {
  /** The class body (embeddable in larger/negated classes) — the single
    * source of truth for what counts as whitespace. */
  val WsChars: String = raw" \t\n\x0B\f\r"

  /** Whitespace run — identical under java.util.regex and RE2. */
  val Ws: String = s"[$WsChars]+"
}
