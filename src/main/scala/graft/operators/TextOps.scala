package graft.operators

/** Shared text-pipeline building blocks, expressed twice: as Spark SQL
  * expression strings (codegen'd higher-order functions — no UDFs) and as
  * the mirrored DuckDB SQL for the oracle. Keeping both in one place
  * guarantees the two engines compute the same definition.
  *
  * Normalization: lowercase → strip non-[a-z0-9 ] → collapse runs of
  * spaces → trim. Tokens: split on single space, drop empties.
  * Shingles: distinct 3-word n-grams.
  */
object TextOps {

  // ---- Spark SQL expression fragments (input column: text) ----

  /** Regex/HOF formulations — the definitional baseline. The declared
    * queries use the native single-pass expressions below instead
    * (graft.functions.NormText/NormTokens, registered via Tables.t);
    * TextOpsSpec asserts the two formulations are equal on the corpus
    * and on adversarial inputs, so swapping was output-neutral.
    */
  val normHofS: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''), " +
      "' +', ' '))"

  val toksHofS: String = s"filter(split($normHofS, ' '), x -> x != '')"

  val normS: String = "norm_text(text)"

  val toksS: String = "norm_tokens(text)"

  /** Distinct 3-word shingles; empty typed array below 3 tokens.
    *
    * IMPORTANT eval-cost shape: `toks` must be an *attribute* (a
    * materialized column), never an inlined expensive expression — it is
    * referenced from zip_with data arguments only (never inside a lambda
    * body via element_at), so each reference evaluates once per row, not
    * once per array element. Spark HOFs are interpreted (no codegen /
    * no subexpression elimination): an expression referenced per-element
    * re-evaluates its whole subtree per element.
    */
  def shinglesS(toks: String): String =
    s"array_distinct(zip_with(zip_with(" +
      s"slice($toks, 1, greatest(size($toks) - 2, 0)), " +
      s"slice($toks, 2, greatest(size($toks) - 2, 0)), " +
      s"(a, b) -> concat(a, ' ', b)), " +
      s"slice($toks, 3, greatest(size($toks) - 2, 0)), " +
      s"(ab, c) -> concat(ab, ' ', c)))"

  // ---- DuckDB oracle fragments (input column: text) ----

  val normD: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', " +
      "'g'), ' +', ' ', 'g'))"

  val toksD: String =
    s"list_filter(string_split($normD, ' '), x -> x != '')"

  def shinglesD(toks: String): String =
    s"list_distinct(list_transform(range(1, greatest(len($toks) - 2, 0) " +
      s"+ 1), i -> $toks[i] || ' ' || $toks[i + 1] || ' ' || $toks[i + 2]))"

  /** DuckDB CTE producing (doc_id, sh) with non-empty shingle sets —
    * the mirror of DedupQueries' Spark-side doc→shingles stage.
    */
  val docShinglesCteD: String =
    s"""d AS (
       |  SELECT doc_id, ${shinglesD("toks")} AS sh
       |  FROM (SELECT doc_id, $toksD AS toks FROM documents)
       |  WHERE len(${shinglesD("toks")}) > 0
       |)""".stripMargin

  // ---- Stopword lists for language-ID / quality heuristics ----

  val stopEn = Seq("the", "a", "and", "of", "to", "in", "is", "on", "for",
    "with")
  val stopDe = Seq("der", "die", "das", "und", "ist", "von", "mit", "ein",
    "zu", "den")
  val stopEs = Seq("el", "la", "que", "y", "en", "un", "es", "se", "no",
    "los")
  val stopFr = Seq("le", "les", "et", "une", "est", "pour", "dans", "au",
    "du", "par")

  def arrS(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("array(", ", ", ")")

  def arrD(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")
}
