package graft.naming

/** Token-level variable normalization (B26/B27): replace non-conforming
  * name tokens with mapped concept IDs. Utility module in the reference
  * (`/root/reference/core/variable_normalizer.py:3-103`, not wired to any
  * endpoint); ported for surface completeness. */
object VariableNormalizer {

  /** Replace exception tokens with `D_<mapped CID>`; other tokens pass
    * through. Ref: `core/variable_normalizer.py:3-34`. */
  def fixImpureVariable(name: String, exceptionMap: Map[String, String]): String =
    name.split('_').map { token =>
      exceptionMap.get(token).map(cid => s"D_$cid").getOrElse(token)
    }.mkString("_")

  /** Validate tokens (allowed: `D`/`d`, 1-digit, 9-digit) and fix names
    * matching `[A-Z]{2,}` without any `d_<9 digits>` CID. Throws listing
    * every unmapped non-conforming token.
    * Ref: `core/variable_normalizer.py:36-103`. */
  def fixAllVariables(names: Seq[String], exceptionMap: Map[String, String]): Seq[String] = {
    val missing = (for {
      name <- names
      raw <- name.split('_')
      token = raw.trim
      if token.nonEmpty
      if !token.equalsIgnoreCase("D")
      if !(token.forall(_.isDigit) && (token.length == 9 || token.length == 1))
      if !exceptionMap.contains(token)
    } yield token).toSet
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Missing exception mapping for tokens: ${missing.toSeq.sorted.mkString(", ")}. " +
          "Please add these tokens to the exception_map.")

    val upperRun = "[A-Z]{2,}".r
    val cid = "[dD]_\\d{9}".r
    names.map { name =>
      if (upperRun.findFirstIn(name).isDefined && cid.findFirstIn(name).isEmpty)
        fixImpureVariable(name, exceptionMap)
      else name
    }
  }
}
